"""Probabilistic distortion sampler — jittable `Noiser` + `distortion_unit`.

The reference's `Noiser` (`utils/noise_layers/noiser.py:12-44`) picks ONE
distortion per call with `np.random.choice` over a probability vector (the
caller can override probs per call — stage 1 stages them through the
curriculum, `latent_wm_pretrain.py:185-188`).  Here the choice is a traced
`jax.random.choice` + `lax.switch`, so the whole thing lives inside the
jitted train step; probabilities are a traced argument (no retrace when
the curriculum changes them).

`distortion_unit` mirrors the milder stage-3 set
(`noiser.py:46-71`: color_jitter / crop 432-512 / blur sigma 4 / noise 0.1)
used by `rob_enhance_finetune.py:1018-1025`.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

from aqualora_tpu.distort import noises
from aqualora_tpu.distort.jpeg import jpeg_compress

# Stage-1 layer menu, in the reference's order (noiser.py:19-36):
# [Identity, Jpeg, CropandResize(256-512), GaussianBlur(10), GaussianNoise(.2),
#  ColorJitter]
STAGE1_LAYERS = ("identity", "jpeg", "crop", "blur", "noise", "jitter")


def _identity(key, x):
    return x


def _jpeg(key, x):
    return jpeg_compress(x)


def _crop(key, x):
    return noises.crop_and_resize(key, x, (256, 512), out_size=x.shape[1])


def _blur(key, x):
    return noises.gaussian_blur(key, x, sigma_max=10.0)


def _noise(key, x):
    return noises.gaussian_noise(key, x, std_max=0.2)


def _jitter(key, x):
    return noises.color_jitter(key, x)


def _sharpness_train(key, x):
    # reference Sharpness(strength=1.) nests two uniforms (noises.py:115
    # draws strength U(0,1), RandomSharpness then draws factor
    # U(0, strength)) — the factor distribution is the product of two
    # U(0,1) draws, not a single uniform
    ks, kf = jax.random.split(key)
    s = jax.random.uniform(ks, ())
    return noises.sharpness(kf, x, strength_max=s)


_STAGE1_FNS: List[Callable] = [_identity, _jpeg, _crop, _blur, _noise, _jitter]


class Noiser:
    """noiser(key, images, probs) -> distorted images (one layer per call)."""

    def __init__(self, layers: Sequence[str] = STAGE1_LAYERS):
        table = {"identity": _identity, "jpeg": _jpeg, "crop": _crop,
                 "blur": _blur, "noise": _noise, "jitter": _jitter,
                 "rotation": lambda k, x: noises.rotate(k, x, 180.0),
                 "sharpness": _sharpness_train}
        self.names = list(layers)
        self.fns = [table[n] for n in self.names]

    def __call__(self, key: jax.Array, x: jnp.ndarray,
                 probs: jnp.ndarray) -> jnp.ndarray:
        kc, ka = jax.random.split(key)
        idx = jax.random.choice(kc, len(self.fns), p=jnp.asarray(probs))
        return jax.lax.switch(idx, self.fns, ka, x)


# -- stage-3 milder menu (noiser.py:46-71; probs at rob_enhance:121-132) ----

def _du_jitter(key, x):
    return noises.color_jitter(key, x, brightness=(0.8, 1.2),
                               contrast=(0.8, 1.2), saturation=(0.8, 1.2),
                               hue=(-0.1, 0.1), input_range="01")


def _du_crop(key, x):
    return noises.crop_and_resize(key, x, (432, 512), out_size=x.shape[1])


def _du_blur(key, x):
    return noises.gaussian_blur(key, x, sigma_max=4.0, sigma_min=4.0 - 1e-6,
                                size=5)


def _du_noise(key, x):
    return jnp.clip(noises.gaussian_noise(key, x, fixed_std=0.1), 0.0, 1.0)


DISTORTION_UNIT_FNS = {
    "identity": _identity,
    "color_jitter": _du_jitter,
    "crop": _du_crop,
    "blur": _du_blur,
    "noise": _du_noise,
}


def distortion_unit(key: jax.Array, x01: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Apply one named stage-3 distortion to [0,1] images."""
    return DISTORTION_UNIT_FNS[kind](key, x01)


class Stage3Noiser:
    """The local Noiser of rob_enhance_finetune.py:121-132 — probs over
    [identity, color_jitter, crop, blur, noise], default
    [0.6, 0.1, 0.15, 0.05, 0.1]; operates on [0,1] images."""

    ORDER = ("identity", "color_jitter", "crop", "blur", "noise")
    DEFAULT_PROBS = (0.6, 0.1, 0.15, 0.05, 0.1)

    def __call__(self, key: jax.Array, x01: jnp.ndarray,
                 probs=None) -> jnp.ndarray:
        p = jnp.asarray(probs if probs is not None else self.DEFAULT_PROBS)
        kc, ka = jax.random.split(key)
        idx = jax.random.choice(kc, len(self.ORDER), p=p)
        fns = [DISTORTION_UNIT_FNS[n] for n in self.ORDER]
        return jax.lax.switch(idx, fns, ka, x01)
