"""Differentiable JPEG simulation (HiDDeN-style), TPU-first.

Functionally identical to the reference's conv-as-DCT implementation
(`utils/noise_layers/jpeg_compression.py:67-162`: RGB->YUV, 8x8 block DCT,
zig-zag mask keeping (25, 9, 9) Y/U/V coefficients, IDCT, YUV->RGB) but
computed as two 8x8 matmuls per block via einsum — the natural MXU mapping
(the reference's 64-filter stride-8 conv is a GPU idiom).  The DCT/IDCT
bases use the exact same (unnormalized DCT-II / scaled DCT-III) coefficient
functions, so outputs match the reference bit-for-bit up to float assoc.

Fully differentiable and jittable; used by the stage-1 Noiser and the
stage-3 hardening loop.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# YUV transform of the reference (jpeg_compression.py:53-64)
_RGB2YUV = np.array([[0.299, 0.587, 0.114],
                     [-0.14713, -0.28886, 0.436],
                     [0.615, -0.51499, -0.10001]], np.float32)
_YUV2RGB = np.array([[1.0, 0.0, 1.13983],
                     [1.0, -0.39465, -0.58060],
                     [1.0, 2.03211, 0.0]], np.float32)


def _dct_coeff(n, k, N):
    return np.cos(np.pi / N * (n + 0.5) * k)


def _idct_coeff(n, k, N):
    return ((n == 0) * (-0.5) + np.cos(np.pi / N * (k + 0.5) * n)) * np.sqrt(
        1.0 / (2.0 * N))


@functools.lru_cache()
def _bases(N: int = 8):
    # numpy host constants (jnp in an lru_cache would leak tracers)
    n = np.arange(N)[:, None]
    k = np.arange(N)[None, :]
    Md = _dct_coeff(n, k, N).astype(np.float32)       # [n, k]
    Mi = _idct_coeff(n, k, N).astype(np.float32)      # [n(coeff), k(pixel)]
    return Md, Mi


@functools.lru_cache()
def _zigzag_mask(keep: int, N: int = 8) -> np.ndarray:
    """Keep the first `keep` coefficients in zig-zag order
    (jpeg_compression.py:31-41)."""
    order = sorted(((x, y) for x in range(N) for y in range(N)),
                   key=lambda p: (p[0] + p[1], -p[1] if (p[0] + p[1]) % 2 else p[1]))
    mask = np.zeros((N, N), np.float32)
    for i, j in order[:keep]:
        mask[i, j] = 1.0
    return mask


@functools.lru_cache()
def _yuv_mask(yuv_keep=(25, 9, 9)) -> np.ndarray:
    return np.stack([_zigzag_mask(k) for k in yuv_keep])   # [3, 8, 8]


def _blockify(x: jnp.ndarray):
    """NHWC -> [B, nh, 8, nw, 8, C] with zero pad to multiples of 8."""
    b, h, w, c = x.shape
    ph, pw = (-h) % 8, (-w) % 8
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    return x.reshape(b, hh // 8, 8, ww // 8, 8, c), (h, w)


def jpeg_compress(x: jnp.ndarray, yuv_keep=(25, 9, 9)) -> jnp.ndarray:
    """Differentiable JPEG on NHWC images (value range preserved)."""
    Md, Mi = (jnp.asarray(m) for m in _bases())
    mask = jnp.asarray(_yuv_mask(tuple(yuv_keep)))        # [3, 8, 8]
    yuv = jnp.einsum("bhwc,dc->bhwd", x, jnp.asarray(_RGB2YUV))
    blocks, (h, w) = _blockify(yuv)                       # [B,nh,8,nw,8,3]
    # DCT: Y = Md^T X Md over each 8x8 block
    coef = jnp.einsum("bhiwjc,ik,jl->bhkwlc", blocks, Md, Md)
    coef = coef * mask.transpose(1, 2, 0)[None, None, :, None, :, :]
    # IDCT: out = Mi^T C Mi
    out = jnp.einsum("bhiwjc,ik,jl->bhkwlc", coef, Mi, Mi)
    b, nh, _, nw, _, c = out.shape
    out = out.reshape(b, nh * 8, nw * 8, c)[:, :h, :w, :]
    return jnp.einsum("bhwd,cd->bhwc", out, jnp.asarray(_YUV2RGB))
