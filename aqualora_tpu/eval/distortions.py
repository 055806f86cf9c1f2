"""Eval-time distortion set (`evaluation/utils_eval.py:216-311`) — the
*benchmarking* distortions, independent from the train-time Noiser:
fixed-strength jitter/blur/noise, crop-460 (with resize-to-512 decorator),
REAL PIL JPEG quality-50, rotation 15 deg, sharpness 10, and the SDEdit
regeneration attacks (SD img2img at strength 0.1 / 0.2).

Operates on [0,1] numpy NHWC images (the reference reads PNGs to [0,1]).
Not differentiable by design — these are attacks, not training layers.
"""

from __future__ import annotations

import io as _io
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.distort import noises

DISTORTION_TYPES = ("color_jitter", "crop", "blur", "noise", "jpeg_compress",
                    "rotation", "sharpness", "SDEdit", "SDEdit2")


_to_u8 = None


def _fetch01(y) -> np.ndarray:
    """Quantize a [0,1] device batch to uint8 ON DEVICE, fetch, return
    float [0,1].  The next step in every consumer is the uint8 PNG save
    (values are identical after its round), but the device->host fetch —
    ~0.7 MB/s through the tunnel — carries 4x fewer bytes than f32."""
    global _to_u8
    if _to_u8 is None:
        _to_u8 = jax.jit(lambda v: jnp.round(
            jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint8))
    return np.asarray(_to_u8(y)).astype(np.float32) / 255.0


def _resize512(x01: np.ndarray) -> np.ndarray:
    """resize_decorator (`utils_eval.py:222-230`) — torchvision T.Resize
    on tensors, i.e. NON-antialiased bilinear (torch 2.0-era default);
    ops/resize.bilinear_resize is the torch-exact kernel, where
    jax.image.resize would silently antialias on downscale and low-pass
    the watermark before the distortion."""
    if x01.shape[1:3] != (512, 512):
        from aqualora_tpu.ops.resize import bilinear_resize
        x01 = _fetch01(bilinear_resize(jnp.asarray(x01), 512, 512))
    return x01


def color_jitter(x01, key):
    return _fetch01(noises.color_jitter(
        key, jnp.asarray(x01), brightness=(0.9, 1.1), contrast=(0.9, 1.1),
        saturation=(0.9, 1.1), hue=(-0.1, 0.1), input_range="01"))


def crop(x01, key, size=(460, 460)):
    """Per-image random crop — kornia RandomCrop draws an independent
    offset for every image in the batch (`utils_eval.py:264-267`)."""
    x01 = _resize512(x01)
    b, h, w, c = x01.shape
    ky, kx = jax.random.split(key)
    tys = np.asarray(jax.random.randint(ky, (b,), 0, h - size[0] + 1))
    txs = np.asarray(jax.random.randint(kx, (b,), 0, w - size[1] + 1))
    return np.stack([x01[i, ty:ty + size[0], tx:tx + size[1], :]
                     for i, (ty, tx) in enumerate(zip(tys, txs))])


def blur(x01, key):
    # kernel (3,3) sigma 4.0 fixed (`utils_eval.py:276`)
    return _fetch01(noises.gaussian_blur(key, jnp.asarray(x01),
                                         sigma_max=4.0, sigma_min=4.0 - 1e-6,
                                         size=3))


def noise(x01, key):
    out = noises.gaussian_noise(key, jnp.asarray(x01), fixed_std=0.1)
    return _fetch01(out)


def jpeg_compress(x01, key, quality: int = 50):
    """REAL JPEG at quality 50 (`utils_eval.py:284-290`): the native
    threaded libjpeg round-trip (bit-identical to PIL, parity-tested)
    when built, else PIL serially."""
    u8 = (x01 * 255).clip(0, 255).astype(np.uint8)
    from aqualora_tpu.core import native_loader
    native = native_loader.jpeg_roundtrip_batch(u8, quality)
    if native is not None:
        return native.astype(np.float32) / 255.0
    from PIL import Image
    out = []
    for img in u8:
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=quality)
        buf.seek(0)
        out.append(np.asarray(Image.open(buf), np.uint8))
    return np.stack(out).astype(np.float32) / 255.0


def rotation(x01, key):
    # RandomRotation(degrees=(15,15), p=1): always exactly +15 deg
    # (`utils_eval.py:292`) — NOT a random angle in [-15, 15]
    return _fetch01(noises.rotate(key, jnp.asarray(x01),
                                  degrees=(15.0, 15.0)))


def sharpness(x01, key):
    return _fetch01(noises.sharpness(key, jnp.asarray(x01),
                                     strength_max=10.0, input_range="01"))


class SDEditAttack:
    """Regeneration attack via img2img (`utils_eval.py:244-262`).

    version 1: strength 0.1 (SD-1.5); version 2: strength 0.2 (the
    reference uses SD-2.1 — pass its checkpoint via params/config)."""

    def __init__(self, pipe, params, tokenizer, version: int = 1,
                 resolution: int = 512, batch_size: int = 8):
        strength = 0.1 if version == 1 else 0.2
        self.fn = pipe.make_img2img(num_steps=10, strength=strength,
                                    height=resolution, width=resolution)
        # device_put ONCE (CLAUDE.md rule): _load_sd_checkpoint returns
        # host-numpy leaves, which as jit args would re-upload the whole
        # ~GB weight tree through the tunnel on EVERY chunk
        self.params = jax.device_put(params)
        self.batch_size = batch_size
        ids = tokenizer(["masterpiece"])
        self.ids = jnp.asarray(ids)
        self.neg = jnp.asarray(tokenizer([""]))

    def __call__(self, x01, key):
        # chunk like simple_sample/simple_decode: the eval set (100+
        # images) through a CFG-doubled 512px U-Net in ONE program would
        # blow HBM; the tail is padded so every chunk compiles once
        x = jnp.asarray(x01) * 2.0 - 1.0
        n = x.shape[0]
        bs = min(self.batch_size, n)
        ids = jnp.repeat(self.ids, bs, axis=0)
        neg = jnp.repeat(self.neg, bs, axis=0)
        outs = []
        for i in range(0, n, bs):
            chunk = x[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.repeat(chunk[-1:], pad, 0)], axis=0)
            key, sub = jax.random.split(key)
            out = self.fn(self.params, chunk, ids, neg, sub, 7.5)
            # uint8 on device before the fetch (4x less tunnel traffic)
            out01 = _fetch01((out + 1.0) * 0.5)
            outs.append(out01[: bs - pad if pad else bs])
        return np.concatenate(outs)


def distortion_unit(x01: np.ndarray, kind: str, key,
                    sdedit: Optional[SDEditAttack] = None,
                    sdedit2: Optional[SDEditAttack] = None) -> np.ndarray:
    table: Dict[str, Callable] = {
        "color_jitter": color_jitter, "crop": crop, "blur": blur,
        "noise": noise, "jpeg_compress": jpeg_compress,
        "rotation": rotation, "sharpness": sharpness,
    }
    if kind in table:
        return table[kind](x01, key)
    if kind == "SDEdit":
        if sdedit is None:
            raise ValueError("SDEdit attack requires a pipeline instance")
        return sdedit(x01, key)
    if kind == "SDEdit2":
        if sdedit2 is None:
            raise ValueError("SDEdit2 attack requires a pipeline instance")
        return sdedit2(x01, key)
    raise ValueError(f"unknown distortion {kind}")
