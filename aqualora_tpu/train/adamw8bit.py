"""Blockwise 8-bit AdamW — TPU-native equivalent of bitsandbytes'
AdamW8bit (`train/ppft_train.py:760-771` opts into it with
`--use_8bit_adam`).

The first and second moments are stored as int8 codes with one f32 scale
per 256-element block (bitsandbytes' blockwise dynamic quantization,
linearized: symmetric linear codes for m, non-negative linear codes for
v — simpler than bnb's quantile map but the same 4x state-memory
reduction, and everything stays jit/pjit-friendly: quantize/dequantize
are elementwise ops XLA fuses into the update).

At rank-320 over 192 sites the LoRA optimizer moments are ~1.4 GB in
f32; 8-bit moments cut that to ~0.36 GB on a 16 GB chip.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Quantized:
    """int8 blockwise-quantized tensor; n/shape are static aux data."""

    code: jnp.ndarray     # int8 [n_blocks, BLOCK]
    scale: jnp.ndarray    # f32  [n_blocks, 1]
    n: int
    shape: Tuple[int, ...]

    def tree_flatten(self):
        return (self.code, self.scale), (self.n, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])


def quantize(x: jnp.ndarray, signed: bool) -> Quantized:
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % BLOCK
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    if signed:
        scale = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True) / 127.0
    else:
        scale = jnp.max(blocks, axis=-1, keepdims=True) / 255.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(blocks / scale),
                 -127 if signed else 0, 127 if signed else 255)
    # unsigned codes stored offset by -128 so both fit int8
    code = (q - (0 if signed else 128)).astype(jnp.int8)
    return Quantized(code, scale.astype(jnp.float32), n, tuple(x.shape))


def dequantize(q: Quantized, signed: bool) -> jnp.ndarray:
    vals = q.code.astype(jnp.float32) + (0 if signed else 128)
    return (vals * q.scale).reshape(-1)[: q.n].reshape(q.shape)


class AdamW8bitState(NamedTuple):
    count: jnp.ndarray
    m: tuple              # flat tuple of Quantized (params leaf order)
    v: tuple


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8,
              weight_decay: float = 1e-2) -> optax.GradientTransformation:
    """Drop-in for optax.adamw with int8 blockwise moment storage."""

    def init(params):
        leaves = jax.tree_util.tree_leaves(params)
        m = tuple(quantize(jnp.zeros_like(p, jnp.float32), True)
                  for p in leaves)
        v = tuple(quantize(jnp.zeros_like(p, jnp.float32), False)
                  for p in leaves)
        return AdamW8bitState(jnp.zeros([], jnp.int32), m, v)

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw8bit requires params (weight decay)")
        count = state.count + 1
        # schedule is evaluated at the PRE-increment count (first update
        # uses schedule(0)) — optax.scale_by_schedule convention, so the
        # warmup ramp lines up exactly with the non-8bit path
        lr = (learning_rate(state.count) if callable(learning_rate)
              else learning_rate)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        p_leaves = treedef.flatten_up_to(params)

        updates, new_m, new_v = [], [], []
        for g, mq, vq, p in zip(g_leaves, state.m, state.v, p_leaves):
            g = g.astype(jnp.float32)
            m = b1 * dequantize(mq, True) + (1 - b1) * g
            v = b2 * dequantize(vq, False) + (1 - b2) * g * g
            step = (m / c1) / (jnp.sqrt(v / c2) + eps)
            delta = -lr * (step + weight_decay * p.astype(jnp.float32))
            updates.append(delta.astype(p.dtype))
            new_m.append(quantize(m, True))
            new_v.append(quantize(v, False))
        return (jax.tree_util.tree_unflatten(treedef, updates),
                AdamW8bitState(count, tuple(new_m), tuple(new_v)))

    return optax.GradientTransformation(init, update)
