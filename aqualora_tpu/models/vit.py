"""DINO-layout ViT-B/16 in Flax — backbone family for the DreamSim metric.

Re-implements the reference's vendored DreamSim feature extraction stack
(`evaluation/dreamsim/feature_extraction/vision_transformer.py:139-219` and
the CLIP/OpenCLIP-as-DINO conversions in `load_clip_as_dino.py:12-34`,
`load_open_clip_as_dino.py:7-23`).  All three ensemble backbones share the
DINO VisionTransformer topology; the CLIP variants differ only by:
  - `pos_drop` replaced with a LayerNorm (CLIP's ln_pre) -> `pre_norm`
  - QuickGELU activation (CLIP ViT)                      -> `quick_gelu`
  - LayerNorm eps 1e-5 instead of 1e-6                   -> `ln_eps`
  - a final [dim, proj_dim] projection of the cls token  -> `proj_dim`

Feature taps mirror `dreamsim/model.py:110-118` + `extractor.py:161-175`:
  - 'cls'       : cls token of the LAST block output, BEFORE the final norm
                  (extract_descriptors(layer=11) hooks the block output)
  - 'last_layer': cls token AFTER the final norm (VisionTransformer.forward)
  - 'embedding' : 'last_layer' @ proj (the CLIP image-embedding space)

Weights are imported from the reference checkpoints via
`tools/torch_import.dino_vit_from_torch` (peft qkv-LoRA folded in).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from aqualora_tpu.models.clip import quick_gelu  # noqa: F401 (one home
# for CLIP's activation, load_clip_as_dino.py:6-9 — the text tower and the
# DreamSim CLIP backbones must never diverge)
from aqualora_tpu.ops.attention import dot_product_attention


class ViTBlock(nn.Module):
    """Pre-LN transformer block (vision_transformer.py:100-118)."""

    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4
    quick_gelu: bool = False
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         dtype=self.dtype,
                         name="norm1")(x)
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
        h = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         dtype=self.dtype,
                         name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name="fc1")(h)
        h = quick_gelu(h) if self.quick_gelu else nn.gelu(h, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class ViTB16(nn.Module):
    """__call__(images NHWC) -> dict of feature taps (see module docstring):
    {'cls': [B,dim] pre-final-norm, 'last_layer': [B,dim],
     'tokens': [B,T,dim], 'embedding': [B,proj_dim] (when proj_dim>0)}."""

    dim: int = 768
    depth: int = 12
    heads: int = 12
    patch: int = 16
    image_size: int = 224
    pre_norm: bool = False
    quick_gelu: bool = False
    ln_eps: float = 1e-6
    proj_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
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
        if self.pre_norm:   # CLIP ln_pre in pos_drop's slot
            x = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         dtype=self.dtype,
                             name="pos_drop")(x)
        cls_tap = None
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, quick_gelu=self.quick_gelu,
                         ln_eps=self.ln_eps, dtype=self.dtype,
                         name=f"blocks_{i}")(x)
            if i == 11:
                # the reference hardcodes `layer = 11` for the 'cls' tap
                # (model.py:111, extractor hook on blocks[11]) even for
                # the 24/32-deep MAE ViT-L/H — an INTERMEDIATE block
                # there, not the last; identical to the last block for
                # every depth-12 backbone
                cls_tap = x[:, 0]
        out = {"cls": cls_tap if cls_tap is not None else x[:, 0]}
        x = nn.LayerNorm(epsilon=self.ln_eps, use_fast_variance=False,
                         dtype=self.dtype,
                         name="norm")(x)
        out["last_layer"] = x[:, 0]
        out["tokens"] = x[:, 1:]
        if self.proj_dim:
            proj = self.param("proj", nn.initializers.normal(0.02),
                              (self.dim, self.proj_dim))
            out["embedding"] = x[:, 0] @ proj
        return out


class DreamSimMLP(nn.Module):
    """Residual MLP head used by non-LoRA DreamSim configurations
    (dreamsim/model.py:144-158); the LoRA ensemble uses Identity."""

    in_features: int
    hidden_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.in_features, dtype=self.dtype, name="fc2")(h) + x
