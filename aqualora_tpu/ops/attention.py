"""Attention entry point: Pallas flash attention on TPU, XLA fallback elsewhere.

The only hand-written kernel in the reference is a pure-PyTorch tiled
flash-attention autograd function (`scripts/lib/original_unet.py:160-313`,
plus optional xformers at `train/ppft_train.py:589-600`).  The TPU-native
equivalent is a Pallas online-softmax kernel (ops/flash_attention.py); this
module is the dispatch layer every model goes through.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: Optional[jnp.ndarray], scale: float) -> jnp.ndarray:
    """Plain XLA attention. q: [B, H, Tq, D], k/v: [B, H, Tk, D]."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _bf16_scores_attention(q, k, v, mask, scale):
    """Einsum attention with the [B,H,Tq,Tk] score/prob tensors
    MATERIALIZED IN bf16 (serving experiment, AQUALORA_ATTN_IMPL=
    bf16_scores).

    Motivation: at SD 512px serving shapes XLA stores the f32 logits and
    probs in HBM (T=4096: ~8.6 GB per 64^2 self-attn level at the B16
    CFG batch), and the measured 42 ms attention share of the U-Net
    forward (docs/PERFORMANCE.md op ablation) is mostly that traffic,
    not MXU time.  bf16 halves every [T,T] store/load.  Numerics: the
    MXU still accumulates QK^T in f32 before the bf16 store; softmax
    max-subtraction keeps exp in [0,1] where bf16 carries ~3 significant
    digits; the PV normalizer stays f32 and divides the [T,D] output
    (never a [T,T] re-pass).  ~0.2% relative output error
    (tests/test_ops.py) — same order as the int8-conv serving path.

    MEASURED RESULT (round 3): serving 2.218 imgs/s = -17% vs SDPA's
    2.666.  XLA's fused SDPA never materializes [T,T] at all, so an
    explicit-materialization impl only adds HBM round-trips SDPA had
    already eliminated; halving the bytes cannot win that back.  Kept
    as the measured tombstone of the idea and as a lower-memory
    fallback where SDPA is unavailable (docs/PERFORMANCE.md)."""
    l = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16),
                   preferred_element_type=jnp.bfloat16)
    s = l.astype(jnp.float32) * scale      # fused into consumers, not stored
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1)[..., None]            # f32 row normalizer
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return (out / denom).astype(v.dtype)


def _sdpa_attention(q, k, v, mask, scale):
    """jax.nn.dot_product_attention (XLA fused SDPA), BHTD <-> BTNH.

    Dispatch guarantees mask is None here — masked calls take the einsum
    path (a [B,H,Tq,Tk] mask is NOT layout-compatible with the BTNH
    transpose this wrapper applies to q/k/v)."""
    assert mask is None
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=scale)
    return out.transpose(0, 2, 1, 3)


# trace-time implementation override (see attention_impl below); lets one
# jitted program mix implementations — e.g. the PPFT teacher pass uses the
# fwd-fastest SDPA (no backward exists for it) while the student keeps the
# Pallas flash kernel for its O(T)-memory backward.
_IMPL_OVERRIDE: list = []


@contextlib.contextmanager
def attention_impl(impl: str):
    """Force an implementation for attention calls TRACED inside the
    context ('auto' | 'flash' | 'sdpa' | 'xla').

    CAVEAT: this is a trace-time override.  An outer jitted function that
    was already traced/compiled keeps its baked-in choice — entering the
    context afterwards silently has no effect, because the outer jit cache
    key does not include this override.  Enter it around the code that
    BUILDS/traces the computation (e.g. inside loss_fn construction, the
    way train/ppft_train.make_loss_fn wraps the teacher pass), never
    around a call of an already-jitted function."""
    _IMPL_OVERRIDE.append(impl)
    try:
        yield
    finally:
        _IMPL_OVERRIDE.pop()


@functools.partial(jax.jit, static_argnames=("scale", "use_flash", "impl"))
def _dispatch(q, k, v, mask, scale, use_flash, impl):
    return _dispatch_impl(q, k, v, mask, scale, use_flash, impl)


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          scale: Optional[float] = None,
                          use_flash: bool = True) -> jnp.ndarray:
    """Multi-head attention over [B, H, T, D] tensors.

    Implementation choice (override with AQUALORA_ATTN_IMPL=xla|flash|sdpa
    or the attention_impl() context): the Pallas flash kernel where its
    tiling wins (flash_shapes_ok, measured policy), otherwise XLA.
    """
    import os
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = (_IMPL_OVERRIDE[-1] if _IMPL_OVERRIDE
            else os.environ.get("AQUALORA_ATTN_IMPL", "auto"))
    return _dispatch(q, k, v, mask, scale, use_flash, impl)


def _dispatch_impl(q, k, v, mask, scale, use_flash, impl):
    if impl == "sdpa" and mask is None:
        return _sdpa_attention(q, k, v, mask, scale)
    if impl == "flash_jax" and mask is None and \
            jax.default_backend() == "tpu":
        # the jax-shipped tuned TPU flash kernel (fwd + bwd), as an
        # alternative to ops/flash_attention.py for A/B measurement.
        # It needs 128-divisible sequence lengths (cross-attn at T_k=77
        # falls through to the einsum path).
        if (q.shape[2] % 128 == 0 and k.shape[2] % 128 == 0
                and (q.shape[3] <= 128 or q.shape[3] % 128 == 0)):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as jax_flash)
            return jax_flash(q, k, v, sm_scale=scale)
        return _xla_attention(q, k, v, mask, scale)
    if impl == "bf16_scores":
        return _bf16_scores_attention(q, k, v, mask, scale)
    if impl == "int8" and mask is None:
        # serving experiment: both attention matmuls in dynamic int8
        # (2x MXU peak; halves the d=40 QK^T padding cost).  Forward-only
        # — see ops/quant.int8_attention.
        from aqualora_tpu.ops.quant import int8_attention
        return int8_attention(q, k, v, scale)
    if impl == "xla":
        return _xla_attention(q, k, v, mask, scale)
    if impl == "identity" and mask is None:
        # the mask gate matters: masked call sites (CLIP causal, VAE
        # mid-block) must fall through to the masked XLA path so the
        # ablation's "attention" category stays the U-Net's unmasked
        # attention, not CLIP/VAE mass measured by other categories.
        # ABLATION BOUND ONLY (scripts/ablate_train.py op-category
        # attribution): not an attention algorithm — replaces the whole
        # category with a near-free mean-over-keys broadcast (correct
        # [B,H,Tq,Dv] shape for self- AND cross-attention) so a step can
        # be timed with attention removed.  The 1e-30-scaled q/k term
        # keeps the q/k projections (and their LoRA branches/backward)
        # LIVE — without it XLA dead-code-eliminates them and the
        # variant would overcount the attention share.
        keep_alive = 1e-30 * (jnp.sum(q) + jnp.sum(k))
        return jnp.broadcast_to(jnp.mean(v, axis=2, keepdims=True),
                                q.shape[:3] + (v.shape[-1],)) + keep_alive
    if impl == "auto" and mask is None and jax.default_backend() == "tpu":
        # measured per-shape policy (docs/PERFORMANCE.md): XLA's fused
        # SDPA wins at d=40 (SD-1.5 64^2 level); the Pallas kernel wins
        # at d>=64 with T>=1024, where SDPA spills the [T,T] scores
        # (flash_shapes_ok has the microbench numbers).  With
        # use_flash=False ("no Pallas kernel") flash-eligible shapes go
        # to SDPA too — never to the unfused einsum, the measured-worst
        # implementation at exactly those shapes.
        from aqualora_tpu.ops.flash_attention import (flash_attention,
                                                      flash_shapes_ok)
        if use_flash and flash_shapes_ok(q.shape, k.shape):
            return flash_attention(q, k, v, scale=scale)
        return _sdpa_attention(q, k, v, mask, scale)
    if impl == "flash" and mask is None and jax.default_backend() == "tpu":
        from aqualora_tpu.ops.flash_attention import flash_attention
        tq, d, tk = q.shape[2], q.shape[3], k.shape[2]
        if tq % 128 == 0 and tk % 128 == 0 and tq >= 256 and d <= 256:
            return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, mask, scale)
