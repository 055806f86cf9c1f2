"""Fused Pallas kernel: VAE-latent watermark injection.

The SecretEncoder forward (utils/models.py:51-81) is a chain of small ops:
Dense -> SiLU -> reshape 32x32 -> repeat to 4ch -> nearest x2 -> 3x3 conv
-> (resize) -> add to the latent.  As separate XLA ops this bounces tiny
tensors through HBM; as one Pallas kernel per batch element everything
lives in VMEM (<200 KB) and the 48->1024 projection runs on the MXU.

Two algebraic simplifications make the fusion tight:
  - the channel-repeat before the conv means all 4 conv input channels are
    identical, so conv(repeat(u), K) == conv(u, sum_ci K[:,:,ci,:]): one
    single-channel 3x3 conv with a [3,3,4] kernel;
  - at the native 64x64 latent resolution the trailing bilinear resize is
    the identity, so the whole encode fuses into the add.

Used when (H, W) == (resolution, resolution) on TPU; the Flax module is
the general/CPU path.  Backward runs through the jnp reference via
custom_vjp (stage-1 trains the encoder; stage-2 stop-gradients it).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_inject(latent, msg, dense_k, dense_b, conv_k, conv_b,
                      base_res: int):
    """Pure-jnp reference (identical math to SecretEncoder.encode + add)."""
    h = jax.nn.silu(msg @ dense_k + dense_b)            # [B, base^2]
    b = h.shape[0]
    grid = h.reshape(b, base_res, base_res, 1)
    grid = jnp.repeat(grid, conv_k.shape[2], axis=-1)
    bb, hh, ww, c = grid.shape
    grid = jax.image.resize(grid, (bb, hh * 2, ww * 2, c), "nearest")
    wm = jax.lax.conv_general_dilated(
        grid, conv_k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv_b
    return latent + wm


def _kernel(pad_ref, k1_ref, kb_ref, lat_ref, out_ref,
            *, res: int, channels: int):
    """Fused single-channel 3x3 conv (channel-summed kernel) + bias + add,
    entirely in VMEM.  Mosaic cannot relayout (reshape) vectors in-kernel,
    so the dense projection / upsample run as one XLA matmul outside and
    this kernel consumes the zero-padded upsampled grid [res+2, res+2]."""
    padded = pad_ref[0]
    acc = jnp.zeros((res, res, channels), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = padded[dy:dy + res, dx:dx + res]
            acc = acc + win[:, :, None] * k1_ref[dy, dx, :]
    out_ref[0] = (lat_ref[0] + acc + kb_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_secret_inject(latent, msg, dense_k, dense_b, conv_k, conv_b,
                        base_res: int = 32):
    """latent [B, 2*base, 2*base, C] + encoded(msg); Pallas on TPU."""
    if jax.default_backend() != "tpu":
        return _reference_inject(latent, msg, dense_k, dense_b, conv_k,
                                 conv_b, base_res)
    return _pallas_inject(latent, msg, dense_k, dense_b, conv_k, conv_b,
                          base_res)


def _pallas_inject(latent, msg, dense_k, dense_b, conv_k, conv_b, base_res):
    b, h, w, c = latent.shape
    assert h == 2 * base_res and w == 2 * base_res, (h, w, base_res)
    k1 = jnp.sum(conv_k, axis=2)                        # [3, 3, C]
    # dense + SiLU + nearest x2 (one MXU matmul + broadcasts, XLA)
    v = jax.nn.silu(msg.astype(jnp.float32) @ dense_k.astype(jnp.float32)
                    + dense_b.astype(jnp.float32))
    grid = v.reshape(b, base_res, base_res)
    up = jnp.repeat(jnp.repeat(grid, 2, axis=1), 2, axis=2)   # [b, h, w]
    padded = jnp.pad(up, ((0, 0), (1, 1), (1, 1)))
    kernel = functools.partial(_kernel, res=h, channels=c)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((3, 3, c)),                     # channel-summed conv kernel
            full((c,)),                          # conv bias
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(latent.shape, latent.dtype),
    )(padded, k1.astype(jnp.float32), conv_b.astype(jnp.float32), latent)


def _fwd(latent, msg, dense_k, dense_b, conv_k, conv_b, base_res):
    out = fused_secret_inject(latent, msg, dense_k, dense_b, conv_k, conv_b,
                              base_res)
    return out, (latent, msg, dense_k, dense_b, conv_k, conv_b)


def _bwd(base_res, res, g):
    latent, msg, dense_k, dense_b, conv_k, conv_b = res
    _, vjp = jax.vjp(lambda *a: _reference_inject(*a, base_res), latent, msg,
                     dense_k, dense_b, conv_k, conv_b)
    return vjp(g)


fused_secret_inject.defvjp(_fwd, _bwd)


def inject_from_params(params: Dict, latent: jnp.ndarray, msg: jnp.ndarray,
                       base_res: int = 32):
    """Convenience: SecretEncoder param tree -> fused injection."""
    return fused_secret_inject(
        latent, msg,
        params["secret_dense"]["kernel"], params["secret_dense"]["bias"],
        params["conv_out"]["kernel"], params["conv_out"]["bias"], base_res)
