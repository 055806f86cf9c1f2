"""Jittable, differentiable image distortions (explicit PRNG, NHWC).

Re-implements the reference's kornia/torchvision distortion zoo
(`utils/noise_layers/noises.py:20-119`) with pure JAX primitives:

  Rotation        random angle U(-deg, deg), bilinear resample
  CropandResize   random crop U(256,512)^2 -> resize — realized as one
                  affine bilinear resample to the fixed output size
                  (TPU needs static shapes; the reference's intermediate
                  random-size resize is an extra resampling blur only)
  GaussianBlur    separable depthwise blur, sigma U(0, max), 9x9 support
  GaussianNoise   additive N(0, sigma^2), sigma U(0, max)
  ColorJitter     brightness/contrast/saturation/hue on [0,1] (input
                  [-1,1] is renormalized like noises.py:96-104); hue via
                  YIQ rotation (differentiable)
  Sharpness       unsharp-mask blend with random strength

All functions take (key, x) and are vmap/jit/grad-safe.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# resampling core
# ---------------------------------------------------------------------------

def bilinear_sample(img: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray
                    ) -> jnp.ndarray:
    """Sample img [H, W, C] at float coords (yy, xx) [h, w], bilinear,
    zero padding outside."""
    h, w, _ = img.shape
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    wy = yy - y0
    wx = xx - x0

    def gather(yi, xi):
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yi, xi] * inside[..., None]

    y0i, x0i = y0, x0
    out = (gather(y0i, x0i) * ((1 - wy) * (1 - wx))[..., None]
           + gather(y0i, x0i + 1) * ((1 - wy) * wx)[..., None]
           + gather(y0i + 1, x0i) * (wy * (1 - wx))[..., None]
           + gather(y0i + 1, x0i + 1) * (wy * wx)[..., None])
    return out


def affine_resample(img: jnp.ndarray, matrix: jnp.ndarray,
                    out_hw: Tuple[int, int]) -> jnp.ndarray:
    """img [H,W,C]; matrix [2,3] maps output (y,x,1) -> input (y,x)."""
    oh, ow = out_hw
    gy, gx = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(gy)
    coords = jnp.stack([gy, gx, ones], axis=-1)          # [oh, ow, 3]
    src = coords @ matrix.T                               # [oh, ow, 2]
    return bilinear_sample(img, src[..., 0], src[..., 1])


# ---------------------------------------------------------------------------
# distortions (batch NHWC)
# ---------------------------------------------------------------------------

def rotate(key: jax.Array, x: jnp.ndarray, degrees=180.0) -> jnp.ndarray:
    """kornia RandomRotation convention: scalar d -> angle U(-d, d);
    tuple (lo, hi) -> U(lo, hi) (so (15, 15) is a FIXED +15 deg — the
    eval protocol's rotation attack, `utils_eval.py:292`)."""
    b, h, w, _ = x.shape
    lo, hi = ((-degrees, degrees) if np.isscalar(degrees) else degrees)
    ang = jax.random.uniform(key, (b,), minval=lo, maxval=hi)
    if lo == hi:                  # uniform(a, a) draws NaN/undefined
        ang = jnp.full((b,), lo, jnp.float32)
    rad = ang * (np.pi / 180.0)

    def one(img, r):
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        c, s = jnp.cos(r), jnp.sin(r)
        # rotate about center: src = R^T (dst - c) + c
        m = jnp.stack([jnp.stack([c, -s, cy - c * cy + s * cx]),
                       jnp.stack([s, c, cx - s * cy - c * cx])])
        return affine_resample(img, m, (h, w))

    return jax.vmap(one)(x, rad)


def crop_and_resize(key: jax.Array, x: jnp.ndarray,
                    crop_range: Tuple[int, int] = (256, 512),
                    out_size: int = 512) -> jnp.ndarray:
    """Random crop of size U(crop_range)^2 at a random position, resampled
    to (out_size, out_size) (noises.py:46-57 collapsed to one resample)."""
    b, h, w, _ = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # clamp BOTH bounds to the image: tiny-resolution runs (e.g. the
    # --tiny 64px smokes) would otherwise get minval > maxval and
    # silently sample crops larger than the image (negative offsets
    # reading zero padding)
    lo_h, lo_w = min(crop_range[0], h), min(crop_range[0], w)
    ch = jax.random.uniform(k1, (b,), minval=lo_h,
                            maxval=max(min(crop_range[1], h), lo_h + 1e-6))
    cw = jax.random.uniform(k2, (b,), minval=lo_w,
                            maxval=max(min(crop_range[1], w), lo_w + 1e-6))
    ty = jax.random.uniform(k3, (b,)) * (h - ch)
    tx = jax.random.uniform(k4, (b,)) * (w - cw)

    def one(img, ch, cw, ty, tx):
        sy = ch / out_size
        sx = cw / out_size
        # pixel-center mapping (torch/kornia align_corners=False):
        # src = (dst + 0.5) * s - 0.5 + offset.  Top-left alignment
        # (src = s * dst + offset) shifts content ~s/2 px toward the
        # origin and never samples the crop's bottom/right band — same
        # bug class fixed in train/augment.py cornerfy.
        m = jnp.stack([
            jnp.stack([sy, jnp.float32(0), ty + 0.5 * (sy - 1.0)]),
            jnp.stack([jnp.float32(0), sx, tx + 0.5 * (sx - 1.0)])])
        return affine_resample(img, m, (out_size, out_size))

    return jax.vmap(one)(x, ch, cw, ty, tx)


@functools.lru_cache()
def _gauss_offsets(size: int) -> np.ndarray:
    # numpy (host constant): jnp here would leak a tracer via the cache
    return (np.arange(size, dtype=np.float32) - (size - 1) / 2.0)


def gaussian_blur(key: jax.Array, x: jnp.ndarray, sigma_max: float = 10.0,
                  sigma_min: float = 1e-3, size: int = 9) -> jnp.ndarray:
    """Separable depthwise Gaussian blur; per-batch random sigma
    (noises.py:60-70 samples kernel (3,9) sigma (0,max))."""
    b = x.shape[0]
    sigma = jax.random.uniform(key, (b,), minval=sigma_min, maxval=sigma_max)
    off = jnp.asarray(_gauss_offsets(size))              # [size]
    k1d = jnp.exp(-0.5 * (off[None, :] / sigma[:, None]) ** 2)
    k1d = k1d / jnp.sum(k1d, axis=-1, keepdims=True)     # [b, size]

    c = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")

    def one(img, k):
        # two depthwise lax convs (the TPU conv unit), not HxW vmapped
        # jnp.convolve calls; the Gaussian kernel is symmetric so the
        # convolve/correlate flip is a no-op
        pad = size // 2
        p = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="edge")
        kv = jnp.broadcast_to(k[:, None, None, None], (size, 1, 1, c))
        v = jax.lax.conv_general_dilated(p[None], kv, (1, 1), "VALID",
                                         dimension_numbers=dn,
                                         feature_group_count=c)[0]
        p = jnp.pad(v, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        kh = jnp.broadcast_to(k[None, :, None, None], (1, size, 1, c))
        return jax.lax.conv_general_dilated(p[None], kh, (1, 1), "VALID",
                                            dimension_numbers=dn,
                                            feature_group_count=c)[0]

    return jax.vmap(one)(x, k1d)


def gaussian_noise(key: jax.Array, x: jnp.ndarray,
                   std_max: float = 0.2, fixed_std: float | None = None
                   ) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    if fixed_std is None:
        std = jax.random.uniform(k1, (x.shape[0], 1, 1, 1), maxval=std_max)
    else:
        std = jnp.float32(fixed_std)
    return x + std * jax.random.normal(k2, x.shape, x.dtype)


_YIQ = np.array([[0.299, 0.587, 0.114],
                 [0.596, -0.274, -0.322],
                 [0.211, -0.523, 0.312]], np.float32)
_YIQ_INV = np.linalg.inv(_YIQ).astype(np.float32)


def _grayscale(x01):
    w = jnp.asarray([0.299, 0.587, 0.114], x01.dtype)
    return jnp.sum(x01 * w, axis=-1, keepdims=True)


def color_jitter(key: jax.Array, x: jnp.ndarray,
                 brightness=(0.7, 1.3), contrast=(0.8, 1.25),
                 saturation=(0.8, 1.25), hue=(-0.2, 0.2),
                 input_range: str = "pm1") -> jnp.ndarray:
    """kornia ColorJiggle equivalent (noises.py:91-104). input_range 'pm1'
    renormalizes [-1,1] -> [0,1] and back; '01' operates directly."""
    b = x.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)
    x01 = x / 2.0 + 0.5 if input_range == "pm1" else x
    u = lambda k, lo, hi: jax.random.uniform(
        k, (b, 1, 1, 1), minval=lo, maxval=hi)
    x01 = jnp.clip(x01 * u(kb, *brightness), 0, 1)
    mean = jnp.mean(_grayscale(x01), axis=(1, 2), keepdims=True)
    x01 = jnp.clip(mean + (x01 - mean) * u(kc, *contrast), 0, 1)
    gray = _grayscale(x01)
    x01 = jnp.clip(gray + (x01 - gray) * u(ks, *saturation), 0, 1)
    # hue rotation in YIQ space
    ang = u(kh, hue[0], hue[1])[..., 0] * (2 * np.pi)    # [b,1,1]
    yiq = jnp.einsum("bhwc,dc->bhwd", x01, jnp.asarray(_YIQ))
    c, s = jnp.cos(ang), jnp.sin(ang)
    i, q = yiq[..., 1], yiq[..., 2]
    yiq = jnp.stack([yiq[..., 0], c * i - s * q, s * i + c * q], axis=-1)
    x01 = jnp.clip(jnp.einsum("bhwd,cd->bhwc", yiq, jnp.asarray(_YIQ_INV)), 0, 1)
    return x01 * 2.0 - 1.0 if input_range == "pm1" else x01


_SHARP_KERNEL = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0


def sharpness(key: jax.Array, x: jnp.ndarray, strength_max: float = 1.0,
              input_range: str = "pm1") -> jnp.ndarray:
    """kornia/PIL sharpness with a random factor (noises.py:107-119;
    eval `utils_eval.py:294`).

    PIL blend semantics (kornia copies TF autoaugment's `blend(degenerate,
    orig, factor)`): factor 0 -> blurred, 1 -> identity, f -> orig +
    (f-1)*(orig-blur).  `RandomSharpness(sharpness=s, p=1)` draws the
    factor U(0, s), so the distribution INCLUDES the blur/identity end —
    a pure unsharp gain U(0, s) (PIL factor [1, s+1)) would never blur
    and systematically over-sharpen vs the reference protocol."""
    b = x.shape[0]
    f = jax.random.uniform(key, (b, 1, 1, 1), maxval=strength_max)
    x01 = x / 2.0 + 0.5 if input_range == "pm1" else x
    k = jnp.asarray(_SHARP_KERNEL)[:, :, None, None]     # HWIO depthwise
    c = x01.shape[-1]
    kd = jnp.tile(k, (1, 1, 1, c))
    blurred = jax.lax.conv_general_dilated(
        x01, kd, (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = jnp.clip(blurred + f * (x01 - blurred), 0, 1)
    # borders keep the original pixels (TF/kornia fill the degenerate's
    # borders with the source before blending)
    out = out.at[:, 0].set(x01[:, 0]).at[:, -1].set(x01[:, -1])
    out = out.at[:, :, 0].set(x01[:, :, 0]).at[:, :, -1].set(x01[:, :, -1])
    return out * 2.0 - 1.0 if input_range == "pm1" else out
