"""Shared SD-1.5 building blocks (Flax, NHWC, LoRA-aware).

From-scratch TPU-first implementations of the layer zoo the reference gets
from diffusers (and that kohya re-implements at
`scripts/lib/original_unet.py:323-1311`): timestep embeddings, ResNet
blocks, spatial transformers with self/cross attention, up/down sampling.
Module names mirror the diffusers attribute paths (with list indices
folded into the name, `down_blocks.0` -> `down_blocks_0`) so safetensors
key conversion is a pure renaming pass (core/io.py).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import LoRAConfig
from aqualora_tpu.models.lora import DiagScale, LoRAConv, LoRADense
from aqualora_tpu.ops.attention import dot_product_attention


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers get_timestep_embedding)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class Conv2D(nn.Module):
    """nn.Conv-compatible conv (same param names/shapes/init, NHWC/HWIO)
    that takes the int8 serving path when its kernel arrives quantized
    (see ops/quant.py): int8 x int8 conv on the MXU with a per-out-channel
    weight scale and dynamic per-image activation scale."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        from aqualora_tpu.ops.quant import module_int8_apply
        y = module_int8_apply(self, x, kernel, self.features,
                              dtype=self.dtype,
                              conv_kwargs={"strides": self.strides,
                                           "padding": self.padding})
        if y is None:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.strides, padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 (320 -> 1280 for SD-1.5)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(h)


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 with additive time embedding and 1x1 shortcut."""

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = Conv2D(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                   dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = Conv2D(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                   dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = Conv2D(self.out_channels, (1, 1), dtype=self.dtype,
                              name="conv_shortcut")(residual)
        return residual + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv. `pad` asymmetric ((0,1),(0,1)) in the VAE encoder."""

    out_channels: int
    pad: Tuple[Tuple[int, int], Tuple[int, int]] = ((1, 1), (1, 1))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv2D(self.out_channels, (3, 3), strides=(2, 2),
                      padding=self.pad, dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    """Nearest x2 then 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv2D(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="conv")(x)


class Attention(nn.Module):
    """Multi-head attention with LoRA on to_q/to_k/to_v/to_out.

    The four LoRA sites per attention module in `utils/unet_keys.json`
    (applied via the patched forwards, `utils/lora_modules.py:46-62`).
    """

    query_dim: int
    heads: int
    cross_attention_dim: Optional[int] = None
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 scale: DiagScale = None) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads

        q = LoRADense(inner, use_bias=False, lora=self.lora, dtype=self.dtype,
                      name="to_q")(x, scale)
        k = LoRADense(inner, use_bias=False, lora=self.lora, dtype=self.dtype,
                      name="to_k")(ctx, scale)
        v = LoRADense(inner, use_bias=False, lora=self.lora, dtype=self.dtype,
                      name="to_v")(ctx, scale)

        def split(t):  # [B, T, C] -> [B, H, T, D]
            b, s, _ = t.shape
            return t.reshape(b, s, self.heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(split(q), split(k), split(v),
                                    scale=head_dim ** -0.5)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return LoRADense(self.query_dim, use_bias=True, lora=self.lora,
                         dtype=self.dtype, name="to_out_0")(out, scale)


class GEGLU(nn.Module):
    """proj to 2*inner, gate with GELU. LoRA site `ff.net.0.proj`."""

    inner_dim: int
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale = None) -> jnp.ndarray:
        h = LoRADense(self.inner_dim * 2, lora=self.lora, dtype=self.dtype,
                      name="proj")(x, scale)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    """GEGLU -> Dense. LoRA sites `ff.net.0.proj` and `ff.net.2`."""

    dim: int
    mult: int = 4
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: DiagScale = None) -> jnp.ndarray:
        h = GEGLU(self.dim * self.mult, lora=self.lora, dtype=self.dtype,
                  name="net_0")(x, scale)
        return LoRADense(self.dim, lora=self.lora, dtype=self.dtype,
                         name="net_2")(h, scale)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> ff, each pre-LayerNormed and residual."""

    dim: int
    heads: int
    cross_attention_dim: int
    lora: LoRAConfig = LoRAConfig(enabled=False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 scale: DiagScale = None) -> jnp.ndarray:
        # torch nn.LayerNorm semantics (diffusers BasicTransformerBlock
        # defaults): eps=1e-5 and two-pass variance — flax's defaults
        # (1e-6, fast variance) drift across the ~48 norms per forward
        def norm(name):
            return nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                dtype=self.dtype, name=name)

        h = norm("norm1")(x)
        x = x + Attention(self.dim, self.heads, lora=self.lora,
                          dtype=self.dtype, name="attn1")(h, None, scale)
        h = norm("norm2")(x)
        x = x + Attention(self.dim, self.heads, self.cross_attention_dim,
                          lora=self.lora, dtype=self.dtype,
                          name="attn2")(h, context, scale)
        h = norm("norm3")(x)
        return x + FeedForward(self.dim, lora=self.lora, dtype=self.dtype,
                               name="ff")(h, scale)


class Transformer2DModel(nn.Module):
    """GroupNorm -> proj_in(1x1) -> transformer blocks -> proj_out(1x1) + res.

    proj_in / proj_out are the two conv LoRA sites per transformer in
    `utils/unet_keys.json` (injected at `ppft_train.py:636-650`).
    """

    channels: int
    heads: int
    cross_attention_dim: int
    num_layers: int = 1
    groups: int = 32
    lora: LoRAConfig = LoRAConfig(enabled=False)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 scale: DiagScale = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        out = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                           name="norm")(x)
        out = LoRAConv(self.channels, (1, 1), lora=self.lora, dtype=self.dtype,
                       name="proj_in")(out, scale)
        out = out.reshape(b, h * w, c)
        block_cls = BasicTransformerBlock
        if self.remat:   # trade FLOPs for memory (jax.checkpoint)
            block_cls = nn.remat(BasicTransformerBlock,
                                 static_argnums=())
        for i in range(self.num_layers):
            out = block_cls(
                self.channels, self.heads, self.cross_attention_dim,
                lora=self.lora, dtype=self.dtype,
                name=f"transformer_blocks_{i}")(out, context, scale)
        out = out.reshape(b, h, w, c)
        out = LoRAConv(self.channels, (1, 1), lora=self.lora, dtype=self.dtype,
                       name="proj_out")(out, scale)
        return out + residual
