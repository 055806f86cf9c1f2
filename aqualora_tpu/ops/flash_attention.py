"""Pallas TPU flash attention (tiled online-softmax).

TPU-native replacement for the reference's hand-written memory-efficient
attention (`scripts/lib/original_unet.py:160-313`, a pure-PyTorch
`FlashAttentionFunction` with manual q/k bucket tiling) and its optional
xformers path (`train/ppft_train.py:589-600`).

Design: grid (B, H, num_q_blocks, num_k_blocks) with the k dimension
innermost; the running max / normalizer / accumulator live in VMEM scratch
that persists across the sequential k iterations (TPU grids execute in
lexicographic order).  Softmax statistics are fp32 regardless of input
dtype.  The backward pass recomputes attention with XLA (flash backward
kernel is a later optimization); `jax.checkpoint` on the transformer blocks
keeps training memory bounded either way.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def flash_shapes_ok(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...]) -> bool:
    """Flash kernel eligibility.

    Measured on v5e (scripts/ablate_tpu.py): at SD-1.5 shapes (T<=4096,
    d=40) XLA's fused attention beats this kernel — the d<128 lane padding
    wastes most of the MXU — so flash engages only where the O(T^2)
    logits buffer becomes the binding constraint (very long sequences,
    e.g. 768px+ latents) or the head dim fills the lanes."""
    if len(q_shape) != 4 or len(k_shape) != 4:
        return False
    tq, d = q_shape[2], q_shape[3]
    tk = k_shape[2]
    aligned = tq % 128 == 0 and tk % 128 == 0 and d <= 256
    big_seq = tq >= 8192 and tk >= 8192
    full_lanes = d >= 128 and tq >= 1024 and tk >= 1024
    return aligned and (big_seq or full_lanes)


def _block_sizes(tq: int, tk: int) -> Tuple[int, int]:
    bq = 512 if tq % 512 == 0 else (256 if tq % 256 == 0 else 128)
    bk = 1024 if tk % 1024 == 0 else (512 if tk % 512 == 0 else
                                      (256 if tk % 256 == 0 else 128))
    return bq, bk


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)          # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)          # [bk, d]
    v = v_ref[0, 0].astype(jnp.float32)          # [bk, d]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    m_prev = m_scr[:, :1]                        # [bq, 1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                       # [bq, bk]
    alpha = jnp.exp(m_prev - m_new)              # [bq, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        out = acc_scr[:] / l_scr[:, :1]
        o_ref[0, 0] = out.astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk)

    grid = (b, h, tq // bq, tk // bk)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda ib, ih, iq, ik: (ib, ih, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda ib, ih, iq, ik: (ib, ih, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max
            pltpu.VMEM((bq, 128), jnp.float32),   # running normalizer
            pltpu.VMEM((bq, d), jnp.float32),     # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Flash attention over [B, H, T, D]; unmasked (the U-Net case)."""
    return _flash_forward(q, k, v, scale)


def _fa_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _fa_bwd(scale, res, g):
    # XLA recompute backward: exact gradients, O(T^2) transient memory.
    q, k, v = res

    def ref_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
