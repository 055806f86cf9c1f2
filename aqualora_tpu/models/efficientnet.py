"""EfficientNet (B1 by default) in Flax — the SecretDecoder backbone.

The reference uses torchvision's ImageNet-pretrained `efficientnet_b1` with
the classifier head replaced by Linear(1280 -> bits*2)
(`utils/models.py:84-96`).  This is a from-scratch NHWC implementation of
the same topology (MBConv + squeeze-excitation + stochastic depth);
torchvision checkpoints can be imported via tools/torch_import.py.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aqualora_tpu.core.config import EfficientNetConfig

# (expand_ratio, channels, repeats, stride, kernel) — EfficientNet-B0 base.
_B0_STAGES: List[Tuple[int, int, int, int, int]] = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_channels(ch: float, width_mult: float, divisor: int = 8) -> int:
    ch *= width_mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return new


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(r * depth_mult))


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class SqueezeExcite(nn.Module):
    squeeze_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), dtype=self.dtype,
                    name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand_ratio: int
    kernel: int
    stride: int
    sd_prob: float  # stochastic depth drop probability
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        expanded = self.in_channels * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = ConvBNAct(expanded, 1, dtype=self.dtype, name="expand")(h, train)
        h = ConvBNAct(expanded, self.kernel, self.stride, groups=expanded,
                      dtype=self.dtype, name="depthwise")(h, train)
        h = SqueezeExcite(max(1, self.in_channels // 4), dtype=self.dtype,
                          name="se")(h)
        h = ConvBNAct(self.out_channels, 1, act=False, dtype=self.dtype,
                      name="project")(h, train)
        if self.stride == 1 and self.in_channels == self.out_channels:
            if train and self.sd_prob > 0:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1.0 - self.sd_prob,
                                            (h.shape[0], 1, 1, 1))
                h = h * keep / (1.0 - self.sd_prob)
            h = h + residual
        return h


class EfficientNet(nn.Module):
    """__call__(images NHWC, train) -> logits [B, num_classes]."""

    cfg: EfficientNetConfig
    dtype: jnp.dtype = jnp.float32
    stochastic_depth_prob: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        stem_ch = _round_channels(32, cfg.width_mult)
        x = ConvBNAct(stem_ch, 3, 2, dtype=self.dtype, name="stem")(x, train)

        total_blocks = sum(_round_repeats(r, cfg.depth_mult)
                           for _, _, r, _, _ in _B0_STAGES)
        block_idx = 0
        in_ch = stem_ch
        for si, (er, ch, reps, stride, kernel) in enumerate(_B0_STAGES):
            out_ch = _round_channels(ch, cfg.width_mult)
            for bi in range(_round_repeats(reps, cfg.depth_mult)):
                sd = self.stochastic_depth_prob * block_idx / total_blocks
                x = MBConv(in_ch, out_ch, er, kernel,
                           stride if bi == 0 else 1, sd, dtype=self.dtype,
                           name=f"blocks_{si}_{bi}")(x, train)
                in_ch = out_ch
                block_idx += 1

        head_ch = _round_channels(1280, cfg.width_mult)
        x = ConvBNAct(head_ch, 1, dtype=self.dtype, name="head")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        if train and cfg.dropout_rate > 0:
            x = nn.Dropout(cfg.dropout_rate, deterministic=False)(x)
        return nn.Dense(cfg.num_classes, dtype=self.dtype, name="classifier")(x)
