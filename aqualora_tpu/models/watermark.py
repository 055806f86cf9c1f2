"""The watermark model core: SecretEncoder, SecretDecoder, MapperNet.

Faithful functional re-implementations of `utils/models.py:51-115`
(NHWC, explicit PRNG), fused-kernel-friendly:

  SecretEncoder (models.py:51-81): N-bit message -> additive perturbation
    in VAE latent space.  Linear(N -> 32*32) -> SiLU -> [B,32,32,1] ->
    repeat to 4 channels -> nearest-upsample x(res/32) -> zero-init 3x3
    conv.  `__call__(x, msg)` bilinearly resizes the encoded secret to the
    latent's HxW and returns (x + c, c).

  SecretDecoder (models.py:84-96): RGB image -> per-bit 2-way logits.
    Bilinear resize to 512x512 -> EfficientNet-B1 with the classifier head
    replaced by Linear(-> bits*2) -> [B, bits, 2].

  MapperNet (models.py:98-115): message -> rank-sized diagonal scale.
    Embedding [bits, rank] with orthogonal init and rows normalized to
    unit per-row std (Bessel-corrected, matching torch .std(dim=1)),
    forward: sum of message-selected rows / sqrt(bits) + 1 — the +1 keeps
    the all-zeros message at scale ~= 1.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import EfficientNetConfig, WatermarkConfig
from aqualora_tpu.models.efficientnet import EfficientNet


def _bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch-semantics bilinear (no antialias) as MXU matmuls — the exact
    F.interpolate behavior of models.py:76-79,92-94."""
    from aqualora_tpu.ops.resize import bilinear_resize
    return bilinear_resize(x, h, w)


class SecretEncoder(nn.Module):
    """msg [B, bits] -> latent watermark [B, H, W, 4] (additive)."""

    secret_len: int
    base_res: int = 32
    resolution: int = 64
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def encode(self, msg: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.base_res * self.base_res, dtype=self.dtype,
                     name="secret_dense")(msg.astype(self.dtype))
        h = nn.silu(h)
        h = h.reshape(-1, self.base_res, self.base_res, 1)
        h = jnp.repeat(h, self.latent_channels, axis=-1)
        factor = self.resolution // self.base_res
        if factor > 1:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * factor, ww * factor, c),
                                 method="nearest")
        # zero-init conv: training starts as identity (models.py:63,zero_module)
        return nn.Conv(self.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(h)

    def __call__(self, x: jnp.ndarray, msg: jnp.ndarray):
        c = self.encode(msg)
        c = _bilinear_resize(c, x.shape[1], x.shape[2])
        return x + c, c


class SecretDecoder(nn.Module):
    """image NHWC in [-1, 1] -> logits [B, bits, 2]."""

    output_size: int = 48
    backbone: EfficientNetConfig | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.backbone or EfficientNetConfig.b1()
        res = cfg.decoder_resolution
        x = _bilinear_resize(x, res, res)
        logits = EfficientNet(
            dataclasses.replace(cfg, num_classes=self.output_size * 2),
            dtype=self.dtype, name="model")(x, train)
        return logits.reshape(-1, self.output_size, 2)


def orthogonal_rows_init(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Orthogonal init + per-row std normalization (models.py:106-107)."""
    w = nn.initializers.orthogonal()(key, shape, dtype)
    std = jnp.std(w, axis=1, keepdims=True, ddof=1)
    return w / std


class MapperNet(nn.Module):
    """msg [B, bits] (0/1 floats) -> diagonal scale [B, rank]."""

    input_size: int = 48
    output_size: int = 320
    std: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, msg: jnp.ndarray) -> jnp.ndarray:
        # std is baked into the WEIGHT at init exactly like the reference
        # (models.py:106-108 scales weight.data by std once) — never a
        # forward-time multiplier, so exported mapper weights carry std
        # and imported reference weights are not double-scaled
        emb = self.param(
            "bit_embeddings",
            lambda k, s: orthogonal_rows_init(k, s) * self.std,
            (self.input_size, self.output_size))
        sel = emb[None] * msg[:, :, None].astype(emb.dtype)     # [B, bits, rank]
        return (sel.sum(axis=1) / jnp.sqrt(float(self.input_size)) + 1.0
                ).astype(self.dtype)


def make_watermark_models(cfg: WatermarkConfig,
                          backbone: EfficientNetConfig | None = None,
                          latent_resolution: int = 64):
    """Convenience constructor for the (encoder, decoder, mapper) triple."""
    enc = SecretEncoder(cfg.msg_bits, cfg.secret_grid,
                        latent_resolution)
    dec = SecretDecoder(cfg.msg_bits, backbone)
    mapper = MapperNet(cfg.msg_bits, cfg.lora_rank, cfg.mapper_std)
    return enc, dec, mapper
