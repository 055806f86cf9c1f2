"""ViT-B/16 feature extractor in Flax — backbone for the DreamSim metric.

Replaces the reference's vendored `evaluation/dreamsim/feature_extraction/`
(DINO/CLIP/OpenCLIP ViT-B/16 loaders + `ViTExtractor`).  One generic
pre-LN ViT covers all three backbones; their checkpoints differ only in
weights (importable via tools/torch_import) and minor head handling.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.ops.attention import dot_product_attention


class ViTBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v),
                                    scale=head_dim ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class ViTB16(nn.Module):
    """__call__(images NHWC) -> (cls_embedding [B, dim], tokens [B, T, dim])."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16
    image_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, (self.image_size // self.patch) ** 2 + 1,
                          self.dim))
        x = x + pos
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, dtype=self.dtype,
                         name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0], x[:, 1:]
