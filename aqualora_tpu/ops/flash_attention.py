"""Pallas TPU flash attention (tiled online-softmax), forward + backward.

TPU-native replacement for the reference's hand-written memory-efficient
attention (`scripts/lib/original_unet.py:160-313`, a pure-PyTorch
`FlashAttentionFunction` with manual q/k bucket tiling and a manual
backward) and its optional xformers path (`train/ppft_train.py:589-600`).

Forward: grid (B, H, nq, nk) with k innermost; running max/normalizer/
accumulator live in VMEM scratch across the sequential k steps; the
per-row logsumexp L = m + log(l) is saved for the backward (stored
[B, H, Tq, 8] — the trailing 8 keeps Mosaic's sublane tiling legal).

Backward: two kernels with the standard recompute-P-from-L scheme —
  dQ:    grid (B, H, nq, nk):  dq += (P o (dO V^T - delta)) K * scale
  dK/dV: grid (B, H, nk, nq):  dv += P^T dO;  dk += dS^T Q * scale
delta = rowsum(dO * O) is a cheap XLA reduction.  All transposed products
are expressed as dot_general contractions over the sublane dim (Mosaic
cannot relayout/transpose in-kernel).

Measured policy (docs/PERFORMANCE.md): XLA's fused SDPA wins at head dim
40 (SD-1.5's dominant 64x64 level), where its softmax stays fused; at
head dims >= 64 with T >= 1024 SDPA materializes the [T,T] scores in HBM
(measured cliff: 4.7x at T=4096) and this kernel wins — that covers
SD-1.5's 32x32 d=80 level and EVERY level of SD-2.1 (d=64 heads), plus
long sequences (>= 8192, e.g. 768px latents).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LSE_LANES = 8


def flash_shapes_ok(q_shape: Tuple[int, ...], k_shape: Tuple[int, ...]) -> bool:
    """Flash kernel eligibility (see module docstring).

    d >= 64 threshold (scripts/microbench_dpad.py, on-chip): XLA's fused
    SDPA stops fusing the softmax at head dims >= 64 and spills the
    [T,T] scores to HBM — at B16/H8 it measures 37.2 ms vs this kernel's
    15.4 ms at (T=4096, d=64), 7.65 vs 4.98 at T=2048, 2.79 vs 2.35 at
    T=1024, and 2.79 vs 1.92 at (T=1024, d=80).  At d = 40 SDPA stays in
    its fully-fused regime (7.9 ms at T=4096) and beats the kernel —
    hence the d cut, not a blanket switch."""
    if len(q_shape) != 4 or len(k_shape) != 4:
        return False
    tq, d = q_shape[2], q_shape[3]
    tk = k_shape[2]
    aligned = tq % 128 == 0 and tk % 128 == 0 and d <= 512
    big_seq = tq >= 8192 and tk >= 8192
    wide_heads = d >= 64 and tq >= 1024 and tk >= 1024
    return aligned and (big_seq or wide_heads)


def _check_divisible(tq: int, tk: int, bq: int, bk: int) -> None:
    """Fail loudly instead of silently truncating the grid: `tq // bq`
    would leave trailing output rows uninitialized VMEM and drop trailing
    keys from every softmax.  The dispatcher (ops/attention.py
    flash_shapes_ok) never routes such shapes here, but the op is public."""
    if tq % bq or tk % bk:
        raise ValueError(
            f"flash_attention needs seq lens divisible by the block sizes: "
            f"tq={tq} (bq={bq}), tk={tk} (bk={bk}); pad to a multiple of "
            f"128 or use ops.attention.dot_product_attention")


def _block_sizes(tq: int, tk: int, d: int = 64,
                 bwd: bool = False) -> Tuple[int, int]:
    import os
    bq = 512 if tq % 512 == 0 else (256 if tq % 256 == 0 else 128)
    bk = 1024 if tk % 1024 == 0 else (512 if tk % 512 == 0 else
                                      (256 if tk % 256 == 0 else 128))
    if d <= 64 and tq <= 4096:
        # measured sweep at SD-1.5 training shapes (T=4096, d=40, full
        # fwd+bwd step, docs/PERFORMANCE.md): 2048/512 = 0.333s vs the old
        # 512/1024 = 0.396s (+19%).  Large q-blocks amortize the VPU
        # softmax bookkeeping over MXU work; bk=512 keeps the f32 s/p
        # tiles at 8 MB of VMEM (bk=256 starves the MXU: 0.456s).
        # Scope-limited to tq <= 4096: at T=9216 (768px serving) the same
        # tiling measured 32% SLOWER than 512/1024 (stage-3 bench).
        for cand in (2048, 1024):
            if tq % cand == 0:
                bq = cand
                break
        if tk % 512 == 0:
            bk = 512
    if (d in (64, 80) and not bwd and tq <= 4096
            and tq % 1024 == 0 and tk % 1024 == 0):
        # forward-only override, measured (scripts/microbench_dpad.py
        # tiling sweeps) at the two shapes that hit it:
        #   d=64 [B16,H8,T4096] (SD-2.1 serving): 1024/1024 = 10.3 ms vs
        #     the d<=64 training tiling 2048/512 = 15.6 ms (2048/1024
        #     fails scoped-VMEM; 512/1024 = 11.7).
        #   d=80 [B16,H8,T1024] (SD-1.5 32^2 level): 1024/1024 = 1.77 ms
        #     vs the old 512/1024 default = 1.92 ms (1024/512 = 2.20).
        # Scope-limited to tq <= 4096 like the training tiling above:
        # at T=9216 (768px) large-q tilings measured 32% slower, so the
        # big-seq default 512/1024 stays in charge there.
        bq, bk = 1024, 1024
    if d > 128:     # keep the f32 k/v/s/p tiles inside VMEM at wide heads
        bk = min(bk, 512)
    if not bwd:
        # tuning overrides (scripts/bench_train.py sweeps); clamped to
        # divisors.  Forward-only: the backward has its own _BWD knobs
        # below — letting a forward sweep silently retile the dq/dkv
        # kernels (never measured, bk uncapped) would conflate the two.
        env_bq = int(os.environ.get("AQUALORA_FLASH_BQ", 0))
        env_bk = int(os.environ.get("AQUALORA_FLASH_BK", 0))
        if env_bq and tq % env_bq == 0:
            bq = env_bq
        if env_bk and tk % env_bk == 0:
            bk = env_bk
    if bwd:
        # backward kernels hold more live tiles than the forward (q/k/v/do
        # + p/ds [bq,bk] f32 pairs); bq=2048 puts the dq kernel 60 KB over
        # the 16 MB scoped-VMEM limit in some schedules (B16) — cap it.
        bq = min(bq, 1024)
        if d == 64 and tq <= 4096 and tq % 1024 == 0 and tk % 1024 == 0:
            # measured bwd sweep at [B16,H8,T4096,d64] (microbench_dpad
            # --grad, round 3): full fwd+bwd chain 35.16 ms at 1024/1024
            # vs 35.88 default (1024/512 = 35.82; 2048/1024 = scoped-VMEM
            # OOM) — ~2.8% off the bwd-only time.  d=40 (SD-1.5 training)
            # keeps the round-2 swept 1024/512 above.
            bk = 1024
        # backward-only sweep knobs (scripts/microbench_dpad.py --grad);
        # applied after the cap so a sweep can probe past it deliberately
        env_bq = int(os.environ.get("AQUALORA_FLASH_BQ_BWD", 0))
        env_bk = int(os.environ.get("AQUALORA_FLASH_BK_BWD", 0))
        if env_bq and tq % env_bq == 0:
            bq = env_bq
        if env_bk and tk % env_bk == 0:
            bk = env_bk
    return bq, bk


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale):
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
        l_final = l_scr[:, :1]
        o_ref[0, 0] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(l_final)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, need_lse: bool = False):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk, d)
    _check_divisible(tq, tk, bq, bk)

    grid = (b, h, tq // bq, tk // bk)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda ib, ih, iq, ik: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, _LSE_LANES),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, tq, _LSE_LANES), jnp.float32),
        ),
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
    if need_lse:
        return out, lse
    return out


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, dq_scr,
               *, scale):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]                   # [bq, 1]
    delta = dl_ref[0, 0][:, :1]                  # [bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                         # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                        # [bq, bk]
    dq_scr[:] = dq_scr[:] + jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                dk_ref, dv_ref, dk_scr, dv_scr, *, scale):
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0].astype(jnp.float32)          # [bq, d]
    k = k_ref[0, 0].astype(jnp.float32)          # [bk, d]
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)        # [bq, d]
    lse = lse_ref[0, 0][:, :1]
    delta = dl_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                         # [bq, bk]
    # dV += P^T dO   (contract the q/sublane dim — no in-kernel transpose)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    # dK += dS^T Q * scale
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, scale):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk, d, bwd=True)
    _check_divisible(tq, tk, bq, bk)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (b, h, tq, _LSE_LANES))

    qspec = lambda: pl.BlockSpec((1, 1, bq, d),
                                 lambda ib, ih, i, j: (ib, ih, i, 0),
                                 memory_space=pltpu.VMEM)
    kspec = lambda: pl.BlockSpec((1, 1, bk, d),
                                 lambda ib, ih, i, j: (ib, ih, j, 0),
                                 memory_space=pltpu.VMEM)
    lspec = lambda: pl.BlockSpec((1, 1, bq, _LSE_LANES),
                                 lambda ib, ih, i, j: (ib, ih, i, 0),
                                 memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(b, h, tq // bq, tk // bk),
        in_specs=[qspec(), kspec(), kspec(), qspec(), lspec(), lspec()],
        out_specs=qspec(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v, do, lse, delta)

    # k-major grid for dk/dv: swap the roles of the last two grid dims
    qspec_j = lambda: pl.BlockSpec((1, 1, bq, d),
                                   lambda ib, ih, i, j: (ib, ih, j, 0),
                                   memory_space=pltpu.VMEM)
    kspec_i = lambda: pl.BlockSpec((1, 1, bk, d),
                                   lambda ib, ih, i, j: (ib, ih, i, 0),
                                   memory_space=pltpu.VMEM)
    lspec_j = lambda: pl.BlockSpec((1, 1, bq, _LSE_LANES),
                                   lambda ib, ih, i, j: (ib, ih, j, 0),
                                   memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(b, h, tk // bk, tq // bq),
        in_specs=[qspec_j(), kspec_i(), kspec_i(), qspec_j(), lspec_j(),
                  lspec_j()],
        out_specs=(kspec_i(), kspec_i()),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32),
                        pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Flash attention over [B, H, T, D]; unmasked (the U-Net case)."""
    return _flash_forward(q, k, v, scale)


def _fa_fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale, need_lse=True)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, res, g):
    q, k, v, o, lse = res
    return _flash_backward(q, k, v, o, lse, g, scale)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
