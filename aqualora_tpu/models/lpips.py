"""LPIPS perceptual loss with a VGG16 backbone, in Flax.

Replaces `lpips.LPIPS(net='vgg')` used by stage 1
(`train/latent_wm_pretrain.py:111,182`).  Standard LPIPS: VGG16 features at
relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-normalized, squared difference,
learned 1x1 "lin" weights, spatial mean, sum over layers.

Pretrained VGG16 + lin weights can be imported from the torch `lpips`
package's checkpoint via `tools/torch_import.py`; random init still gives
a valid (untrained) perceptual metric for smoke tests.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

# VGG16 conv plan: (channels, n_convs) per stage; taps at each stage end.
_VGG16_STAGES: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet normalization in [-1,1] space (lpips' ScalingLayer constants)
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    """Returns the 5 LPIPS tap activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        idx = 0
        for si, (ch, n) in enumerate(_VGG16_STAGES):
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if si < len(_VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """lpips(img0, img1) with NHWC inputs in [-1, 1]; returns [B] distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
        def norm_input(x):
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(self.dtype, name="vgg")
        # one batched backbone pass over [x0; x1] (stage-1 hot path):
        # same math as two passes, better MXU occupancy at small batch
        b0 = x0.shape[0]
        taps = vgg(norm_input(jnp.concatenate([x0, x1], axis=0)))
        f0 = [t[:b0] for t in taps]
        f1 = [t[b0:] for t in taps]
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            # eps OUTSIDE the sqrt, exactly like lpips.normalize_tensor
            # (the reference stage-1 loss, train/latent_wm_pretrain.py:111)
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (d.shape[-1], 1))
            # 1x1 conv == matmul over channels; weights kept non-negative
            # like lpips' NetLinLayer usage
            d = d @ jnp.abs(w)
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total
