"""Attention entry point: Pallas flash attention on TPU, XLA fallback elsewhere.

The only hand-written kernel in the reference is a pure-PyTorch tiled
flash-attention autograd function (`scripts/lib/original_unet.py:160-313`,
plus optional xformers at `train/ppft_train.py:589-600`).  The TPU-native
equivalent is a Pallas online-softmax kernel (ops/flash_attention.py); this
module is the dispatch layer every model goes through.
"""

from __future__ import annotations

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


@functools.partial(jax.jit, static_argnames=("scale", "use_flash"))
def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          scale: Optional[float] = None,
                          use_flash: bool = True) -> jnp.ndarray:
    """Multi-head attention over [B, H, T, D] tensors.

    Dispatches to the Pallas flash kernel on TPU when shapes qualify
    (no mask — the U-Net's spatial/cross attention is unmasked — and
    head_dim/sequence lengths aligned); otherwise XLA.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_flash and mask is None and jax.default_backend() == "tpu":
        from aqualora_tpu.ops.flash_attention import flash_attention, flash_shapes_ok
        if flash_shapes_ok(q.shape, k.shape):
            return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, mask, scale)
