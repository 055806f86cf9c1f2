"""SD-1.5 UNet2DConditionModel in Flax with first-class watermark LoRA.

From-scratch TPU-native equivalent of the diffusers U-Net the reference
trains (`train/ppft_train.py:523-548`) with LoRA injected into the 192
modules of `utils/unet_keys.json` (`ppft_train.py:620-678`).  Instead of
monkey-patched forwards, the diagonal message scale is an explicit traced
argument: `unet.apply(params, x, t, context, scale)` — so the PPFT
teacher pass (scale=0, `ppft_train.py:1026-1029`) and student pass
(scale=mapper(msg), `:1032-1035`) jit into one program.

NHWC layout (TPU-native); the safetensors converter (core/io.py) handles
NCHW<->NHWC and torch<->flax kernel transposition.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from aqualora_tpu.core.config import UNetConfig
from aqualora_tpu.models.lora import DiagScale
from aqualora_tpu.models.layers import (
    Downsample2D, ResnetBlock2D, TimestepEmbedding, Transformer2DModel,
    Upsample2D, timestep_embedding)


class CrossAttnDownBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, scale: DiagScale):
        residuals = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, self.cfg.norm_num_groups,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                self.out_channels, self.cfg.heads_for(self.out_channels),
                self.cfg.cross_attention_dim, groups=self.cfg.norm_num_groups,
                lora=self.cfg.lora, remat=self.cfg.remat, dtype=self.dtype,
                name=f"attentions_{i}")(x, context, scale)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class DownBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        residuals = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, self.cfg.norm_num_groups,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            residuals.append(x)
        return x, residuals


class UNetMidBlock2DCrossAttn(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, scale: DiagScale):
        x = ResnetBlock2D(self.channels, self.cfg.norm_num_groups,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2DModel(
            self.channels, self.cfg.heads_for(self.channels),
            self.cfg.cross_attention_dim, groups=self.cfg.norm_num_groups,
            lora=self.cfg.lora, remat=self.cfg.remat, dtype=self.dtype,
            name="attentions_0")(x, context, scale)
        return ResnetBlock2D(self.channels, self.cfg.norm_num_groups,
                             dtype=self.dtype, name="resnets_1")(x, temb)


class CrossAttnUpBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, context, scale: DiagScale):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, res_samples.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.cfg.norm_num_groups,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            x = Transformer2DModel(
                self.out_channels, self.cfg.heads_for(self.out_channels),
                self.cfg.cross_attention_dim, groups=self.cfg.norm_num_groups,
                lora=self.cfg.lora, remat=self.cfg.remat, dtype=self.dtype,
                name=f"attentions_{i}")(x, context, scale)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UpBlock2D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb):
        for i in range(self.cfg.layers_per_block + 1):
            x = jnp.concatenate([x, res_samples.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, self.cfg.norm_num_groups,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class UNet2DConditionModel(nn.Module):
    """The conditional U-Net. __call__(sample NHWC, timesteps, context, scale)."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 scale: DiagScale = None) -> jnp.ndarray:
        cfg = self.cfg
        channels = cfg.block_out_channels
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, channels[0],
                                   cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(t_emb.astype(self.dtype))

        x = nn.Conv(channels[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(sample.astype(self.dtype))

        # -- down ------------------------------------------------------------
        res_samples = [x]
        for i, ch in enumerate(channels):
            last = i == len(channels) - 1
            if cfg.attn_down_blocks[i]:
                x, res = CrossAttnDownBlock2D(
                    cfg, ch, add_downsample=not last, dtype=self.dtype,
                    name=f"down_blocks_{i}")(x, temb, encoder_hidden_states, scale)
            else:
                x, res = DownBlock2D(cfg, ch, add_downsample=not last,
                                     dtype=self.dtype,
                                     name=f"down_blocks_{i}")(x, temb)
            res_samples.extend(res)

        # -- mid ---------------------------------------------------------------
        x = UNetMidBlock2DCrossAttn(cfg, channels[-1], dtype=self.dtype,
                                    name="mid_block")(
            x, temb, encoder_hidden_states, scale)

        # -- up ------------------------------------------------------------------
        rev_channels = tuple(reversed(channels))
        for i, ch in enumerate(rev_channels):
            last = i == len(rev_channels) - 1
            if cfg.attn_up_blocks[i]:
                x = CrossAttnUpBlock2D(
                    cfg, ch, add_upsample=not last, dtype=self.dtype,
                    name=f"up_blocks_{i}")(x, res_samples, temb,
                                           encoder_hidden_states, scale)
            else:
                x = UpBlock2D(cfg, ch, add_upsample=not last, dtype=self.dtype,
                              name=f"up_blocks_{i}")(x, res_samples, temb)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=jnp.float32, name="conv_out")(x)
        return x
