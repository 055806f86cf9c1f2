"""AutoencoderKL (the SD-1.5 VAE) in Flax, NHWC.

The reference keeps the VAE frozen everywhere: stage 1 trains the secret
encoder/decoder *around* it (`train/latent_wm_pretrain.py:171,180-181`),
stage 2 encodes batches with it (`train/ppft_train.py:993`), and sampling
decodes latents with it.  `scaling_factor` (0.18215) multiplies encoded
latents before the U-Net (`ppft_train.py:997`).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import VAEConfig
from aqualora_tpu.models.layers import ResnetBlock2D, Downsample2D, Upsample2D
from aqualora_tpu.ops.attention import dot_product_attention


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in the VAE mid blocks."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        out = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                           name="group_norm")(x)
        out = out.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(out)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(out)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(out)
        out = dot_product_attention(q[:, None], k[:, None], v[:, None],
                                    scale=c ** -0.5)[:, 0]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return residual + out.reshape(b, h, w, c)


class MidBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # diffusers AutoencoderKL builds every VAE resnet with
        # resnet_eps=1e-6 (vs the U-Net's norm_eps=1e-5)
        x = ResnetBlock2D(self.channels, self.groups, eps=1e-6,
                          dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, dtype=self.dtype,
                         name="attentions_0")(x)
        return ResnetBlock2D(self.channels, self.groups, eps=1e-6,
                             dtype=self.dtype, name="resnets_1")(x)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    groups: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.groups, eps=1e-6,
                              dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, pad=((0, 1), (0, 1)),
                             dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    groups: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, self.groups, eps=1e-6,
                              dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        chans = cfg.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(chans):
            x = DownEncoderBlock2D(ch, cfg.layers_per_block,
                                   cfg.norm_num_groups,
                                   add_downsample=i < len(chans) - 1,
                                   dtype=self.dtype,
                                   name=f"down_blocks_{i}")(x)
        x = MidBlock(chans[-1], cfg.norm_num_groups, dtype=self.dtype,
                     name="mid_block")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        chans = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(chans[0], cfg.norm_num_groups, dtype=self.dtype,
                     name="mid_block")(x)
        for i, ch in enumerate(chans):
            x = UpDecoderBlock2D(ch, cfg.layers_per_block + 1,
                                 cfg.norm_num_groups,
                                 add_upsample=i < len(chans) - 1,
                                 dtype=self.dtype, name=f"up_blocks_{i}")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=jnp.float32, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Methods: encode_moments / sample / encode / decode / __call__."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (mean, logvar) of the diagonal Gaussian posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    @staticmethod
    def sample_from_moments(mean: jnp.ndarray, logvar: jnp.ndarray,
                            noise: jnp.ndarray) -> jnp.ndarray:
        """`mean + std * noise` — the single home of the posterior
        sampling formula; callers that draw noise themselves (per-image
        key stacks, cached moments) go through here."""
        return mean + jnp.exp(0.5 * logvar) * noise

    def sample(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Sample the posterior (reference `.latent_dist.sample()`)."""
        mean, logvar = self.encode_moments(x)
        return self.sample_from_moments(
            mean, logvar, jax.random.normal(rng, mean.shape, mean.dtype))

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Posterior mode (deterministic encode)."""
        return self.encode_moments(x)[0]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.decode(self.sample(x, rng))
