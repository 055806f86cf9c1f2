"""Training losses (stage 1: latent_wm_pretrain.py:39-50,182-195)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

PRVL_WINDOW = 32


def prvl_loss(img1: jnp.ndarray, img2: jnp.ndarray,
              window: int = PRVL_WINDOW) -> jnp.ndarray:
    """Peak Regional Visual Loss: max over the image of the box-filtered
    channel-mean absolute difference (latent_wm_pretrain.py:39-50 — conv
    with a constant 32x32/1024 kernel, padding window//2, then global max).
    NHWC inputs."""
    diff = jnp.mean(jnp.abs(img1 - img2), axis=-1, keepdims=True)  # [B,H,W,1]
    kernel = jnp.ones((window, window, 1, 1), diff.dtype) / (window * window)
    pooled = jax.lax.conv_general_dilated(
        diff, kernel, (1, 1),
        padding=((window // 2, window // 2), (window // 2, window // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.max(pooled)


def message_bce(logits: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
    """BCE between per-bit 2-way logits [B, N, 2] and 0/1 bits [B, N]
    (latent_wm_pretrain.py:192-195: BCE-with-logits against one-hot)."""
    labels = jax.nn.one_hot(msg.astype(jnp.int32), 2)
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def bit_accuracy(logits: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
    """Fraction of correctly decoded bits (argmax over the 2 logits)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == msg.astype(pred.dtype)).astype(jnp.float32))
