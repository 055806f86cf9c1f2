"""Bilinear resize as two MXU matmuls (TPU-native separable resampling).

`jax.image.resize` lowers to gather-heavy code and silently antialiases
on downscale; torch's `F.interpolate(..., mode='bilinear')` — what the
reference's SecretDecoder preprocess does (`utils/models.py:92-94`) — does
NOT antialias.  Here the resize is `R_h @ img @ R_w^T` with host-built
interpolation matrices (2 nonzeros/row; dense matmul is faster on the MXU
than any gather), with exact torch `align_corners=False` semantics and an
optional antialias mode (PIL-style widened kernel) for the train-time
crop/resize distortions.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """[out, in] bilinear interpolation matrix, torch align_corners=False."""
    scale = in_size / out_size
    support = max(scale, 1.0) if antialias else 1.0
    m = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        center = (o + 0.5) * scale - 0.5
        lo = int(np.floor(center - support)) if antialias else int(np.floor(center))
        hi = int(np.ceil(center + support)) if antialias else lo + 1
        idx = np.arange(lo, hi + 1)
        w = 1.0 - np.abs(idx - center) / support
        w = np.clip(w, 0.0, None)
        idx = np.clip(idx, 0, in_size - 1)
        if w.sum() > 0:
            w = w / w.sum()
        np.add.at(m[o], idx, w)
    return m


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int,
                    antialias: bool = False) -> jnp.ndarray:
    """NHWC resize via separable matmuls (matches torch bilinear)."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # astype(int) below would TRUNCATE (and wrap overshoot) instead of
        # torch's round-half-away — no current caller passes ints; refuse
        # rather than return subtly biased pixels
        raise TypeError(f"bilinear_resize wants a floating dtype, got "
                        f"{x.dtype}; cast (and round) at the caller")
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    rh = jnp.asarray(_resize_matrix(h, out_h, antialias))
    rw = jnp.asarray(_resize_matrix(w, out_w, antialias))
    out = jnp.einsum("oh,bhwc->bowc", rh, x)
    out = jnp.einsum("pw,bowc->bopc", rw, out)
    return out.astype(x.dtype)   # interpolate in f32, keep the input dtype
