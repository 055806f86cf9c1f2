"""Stage-1 latent/image augmentations, jit-safe.

`cornerfy` reproduces `gen_combined_latents`'s 1/4-probability corner
augmentation (`train/latent_wm_pretrain.py:133-149`): the four corner
quadrants of the watermark latent are placed at the corners of a larger
(up to 2x) virtual canvas which is then resized back — i.e. the watermark
corners shrink toward the image corners with an empty middle, teaching
crop robustness.  The reference materializes a dynamically-sized canvas;
here a fixed 2Hx2W canvas + traced `dynamic_update_slice` offsets keep
shapes static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aqualora_tpu.distort.noises import bilinear_sample


def cornerfy(key: jax.Array, wm_latent: jnp.ndarray) -> jnp.ndarray:
    """Corner augmentation of a watermark latent [B, H, W, C]."""
    b, h, w, c = wm_latent.shape
    kh, kw = jax.random.split(key)
    hs = jax.random.uniform(kh, (), minval=1.0, maxval=2.0)
    ws = jax.random.uniform(kw, (), minval=1.0, maxval=2.0)
    H2 = jnp.round(h * hs).astype(jnp.int32)
    W2 = jnp.round(w * ws).astype(jnp.int32)

    canvas = jnp.zeros((b, 2 * h, 2 * w, c), wm_latent.dtype)
    hh, hw = h // 2, w // 2
    tl = wm_latent[:, :hh, :hw]
    tr = wm_latent[:, :hh, -hw:]
    bl = wm_latent[:, -hh:, :hw]
    br = wm_latent[:, -hh:, -hw:]
    z = jnp.int32(0)
    canvas = jax.lax.dynamic_update_slice(canvas, tl, (z, z, z, z))
    canvas = jax.lax.dynamic_update_slice(canvas, tr, (z, z, W2 - hw, z))
    canvas = jax.lax.dynamic_update_slice(canvas, bl, (z, H2 - hh, z, z))
    canvas = jax.lax.dynamic_update_slice(canvas, br, (z, H2 - hh, W2 - hw, z))

    # resize the [0:H2, 0:W2] region back to (h, w) bilinearly with
    # torch F.interpolate align_corners=False pixel centers
    # (src = (dst + 0.5) * scale - 0.5), matching the reference's
    # interpolate call — top-left-aligned o*scale would shift the
    # augmented watermark ~0.5 px and never sample the bottom/right band
    sy = H2.astype(jnp.float32) / h
    sx = W2.astype(jnp.float32) / w
    gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * sy - 0.5
    gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * sx - 0.5
    yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
    out = jax.vmap(lambda img: bilinear_sample(img, yy, xx))(canvas)
    return out.astype(wm_latent.dtype)


def maybe_cornerfy(key: jax.Array, wm_latent: jnp.ndarray) -> jnp.ndarray:
    """Apply cornerfy with probability 1/4 (latent_wm_pretrain.py:134)."""
    kp, ka = jax.random.split(key)
    do = jax.random.bernoulli(kp, 0.25)
    return jax.lax.cond(do, lambda _: cornerfy(ka, wm_latent),
                        lambda _: wm_latent, None)


def base_augment(key: jax.Array, image: jnp.ndarray) -> jnp.ndarray:
    """Random horizontal flip + rot90 (latent_wm_pretrain.py:52-56),
    applied with probability 1/2 per batch; NHWC."""
    kp, kf, kr = jax.random.split(key, 3)

    def aug(img):
        flipped = jax.lax.cond(jax.random.bernoulli(kf),
                               lambda x: x[:, :, ::-1], lambda x: x, img)
        k = jax.random.randint(kr, (), 0, 4)
        return jax.lax.switch(
            k, [lambda x: x,
                lambda x: jnp.rot90(x, 1, axes=(1, 2)),
                lambda x: jnp.rot90(x, 2, axes=(1, 2)),
                lambda x: jnp.rot90(x, 3, axes=(1, 2))], flipped)

    return jax.lax.cond(jax.random.bernoulli(kp), aug, lambda x: x, image)
