"""InceptionV3 (FID variant) in Flax — pool3 feature extractor.

Replaces the vendored `evaluation/pytorch_fid/inception.py` (torchvision
InceptionV3 with FID-specific weights; 2048-d pool3 features).  Module
names mirror torchvision (`Mixed_5b.branch1x1.conv` ...) so the FID weight
checkpoint can be imported via tools/torch_import when available; random
init still exercises the full FID pipeline.

Input: NHWC in [-1, 1] at 299x299 (the FID normalization); callers resize.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride), padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return ((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2))


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad((5, 5)), dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), 2, dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad((3, 3)), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), 2, dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((1, 7)), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((7, 1)), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), 2, dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((1, 7)), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((7, 1)), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), 2, dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    # FID variant: E_1 uses avg branch-pool, E_2 uses MAX branch-pool
    # (evaluation/pytorch_fid/inception.py FIDInceptionE_1/E_2)
    pool: str = "avg"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), dtype=self.dtype,
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), dtype=self.dtype,
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad((3, 3)), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((1, 3)), dtype=self.dtype,
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((3, 1)), dtype=self.dtype,
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            p = _avgpool3(x)
        else:
            p = nn.max_pool(x, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(p)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """__call__(images NHWC in [-1,1], 299x299) -> pool3 features [B, 2048]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), 2, dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad((3, 3)), dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))        # pool3: [B, 2048]
