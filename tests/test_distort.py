"""Distortion layer tests, incl. numerical equivalence of the TPU einsum
block-DCT with the reference's conv-as-DCT formulation (SURVEY.md §4(a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aqualora_tpu.distort import jpeg, noises
from aqualora_tpu.distort.noiser import Noiser, Stage3Noiser

KEY = jax.random.PRNGKey(0)


def _reference_jpeg_numpy(x_nhwc, yuv_keep=(25, 9, 9)):
    """Direct numpy transcription of the HiDDeN algorithm
    (jpeg_compression.py:100-162) for equivalence checking."""
    rgb2yuv = np.array([[0.299, 0.587, 0.114],
                        [-0.14713, -0.28886, 0.436],
                        [0.615, -0.51499, -0.10001]], np.float64)
    yuv2rgb = np.array([[1.0, 0.0, 1.13983],
                        [1.0, -0.39465, -0.58060],
                        [1.0, 2.03211, 0.0]], np.float64)
    b, h, w, _ = x_nhwc.shape
    assert h % 8 == 0 and w % 8 == 0
    yuv = x_nhwc @ rgb2yuv.T

    def dct_c(n, k, N=8):
        return np.cos(np.pi / N * (n + 0.5) * k)

    def idct_c(n, k, N=8):
        return ((n == 0) * (-0.5) + np.cos(np.pi / N * (k + 0.5) * n)) / 4.0

    order = sorted(((i, j) for i in range(8) for j in range(8)),
                   key=lambda p: (p[0] + p[1], -p[1] if (p[0] + p[1]) % 2 else p[1]))
    out = np.zeros_like(yuv)
    for bi in range(b):
        for c in range(3):
            mask = np.zeros((8, 8))
            for i, j in order[: yuv_keep[c]]:
                mask[i, j] = 1
            for by in range(h // 8):
                for bx in range(w // 8):
                    blk = yuv[bi, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, c]
                    coef = np.zeros((8, 8))
                    for ky in range(8):
                        for kx in range(8):
                            for ny in range(8):
                                for nx in range(8):
                                    coef[ky, kx] += (dct_c(ny, ky) * dct_c(nx, kx)
                                                     * blk[ny, nx])
                    coef *= mask
                    rec = np.zeros((8, 8))
                    for my in range(8):
                        for mx in range(8):
                            for ny in range(8):
                                for nx in range(8):
                                    rec[my, mx] += (idct_c(ny, my) * idct_c(nx, mx)
                                                    * coef[ny, nx])
                    out[bi, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8, c] = rec
    return out @ yuv2rgb.T


def test_jpeg_matches_reference_algorithm():
    x = np.random.RandomState(0).rand(1, 16, 16, 3).astype(np.float32) * 2 - 1
    ours = np.asarray(jpeg.jpeg_compress(jnp.asarray(x)))
    ref = _reference_jpeg_numpy(x.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_jpeg_identity_when_keeping_all():
    x = jax.random.normal(KEY, (2, 24, 24, 3))
    out = jpeg.jpeg_compress(x, yuv_keep=(64, 64, 64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_jpeg_nonmultiple_shapes_and_grad():
    x = jax.random.normal(KEY, (1, 30, 21, 3))
    out = jpeg.jpeg_compress(x)
    assert out.shape == x.shape
    g = jax.grad(lambda x: jnp.sum(jpeg.jpeg_compress(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


@pytest.mark.parametrize("fn,kwargs", [
    (noises.rotate, {}),
    (noises.crop_and_resize, {"out_size": 64}),
    (noises.gaussian_blur, {}),
    (noises.gaussian_noise, {}),
    (noises.color_jitter, {}),
    (noises.sharpness, {}),
])
def test_distortions_shape_finite_grad(fn, kwargs):
    x = jax.random.uniform(KEY, (2, 64, 64, 3)) * 2 - 1
    out = fn(KEY, x, **kwargs)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda x: jnp.sum(fn(KEY, x, **kwargs) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_eval_crop_draws_per_image_offsets():
    """kornia RandomCrop semantics (`utils_eval.py:264-267`): an
    independent offset per image, not one offset for the whole batch."""
    from aqualora_tpu.eval import distortions as ed
    h = w = 512
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([yy / h, xx / w, np.zeros((h, w))], -1).astype(np.float32)
    x01 = np.stack([base] * 4)
    out = ed.crop(x01, jax.random.PRNGKey(3))
    assert out.shape == (4, 460, 460, 3)
    # the top-left pixel encodes each image's (ty, tx)
    offsets = {(float(out[i, 0, 0, 0]), float(out[i, 0, 0, 1]))
               for i in range(4)}
    assert len(offsets) > 1


def test_noiser_identity_branch():
    noiser = Noiser()
    x = jax.random.uniform(KEY, (1, 32, 32, 3)) * 2 - 1
    probs = jnp.asarray([1.0, 0, 0, 0, 0, 0])
    out = noiser(KEY, x, probs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_noiser_jittable_with_traced_probs():
    noiser = Noiser()
    x = jax.random.uniform(KEY, (1, 32, 32, 3)) * 2 - 1

    @jax.jit
    def f(key, x, probs):
        return noiser(key, x, probs)

    out1 = f(KEY, x, jnp.asarray([0, 1.0, 0, 0, 0, 0]))
    out2 = f(KEY, x, jnp.asarray([0, 0, 0, 0, 1.0, 0]))
    assert np.abs(np.asarray(out1 - out2)).max() > 1e-6


def test_stage3_noiser_range():
    x01 = jax.random.uniform(KEY, (2, 64, 64, 3))
    out = Stage3Noiser()(KEY, x01, (0.0, 0.0, 0.0, 0.0, 1.0))  # noise+clamp
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_rotation_zero_angle_is_identity():
    x = jax.random.uniform(KEY, (1, 16, 16, 3))
    out = noises.rotate(KEY, x, degrees=1e-8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_noiser_respects_probabilities():
    """Over many keys, branch selection tracks the probability vector
    (noiser.py:41-43 semantics)."""
    noiser = Noiser()
    x = jnp.zeros((1, 16, 16, 3))
    probs = jnp.asarray([0.5, 0.0, 0.0, 0.0, 0.5, 0.0])  # identity | noise
    identity_hits = 0
    n = 40
    for i in range(n):
        out = noiser(jax.random.PRNGKey(i), x, probs)
        if float(jnp.abs(out - x).max()) < 1e-9:
            identity_hits += 1
    assert 5 < identity_hits < 35  # both branches occur


def test_noiser_deterministic_per_key():
    noiser = Noiser()
    x = jax.random.uniform(KEY, (1, 16, 16, 3))
    probs = jnp.asarray([0.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    a = noiser(jax.random.PRNGKey(7), x, probs)
    b = noiser(jax.random.PRNGKey(7), x, probs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crop_clamps_to_small_images():
    """crop_and_resize at tiny resolutions (--tiny 64px smokes) must clamp
    BOTH crop bounds to the image: the old minval>maxval draw sampled
    crops larger than the image and resampled mostly zero padding."""
    from aqualora_tpu.distort import noises

    x = jnp.ones((3, 64, 64, 3))
    out = noises.crop_and_resize(jax.random.PRNGKey(0), x, (256, 512),
                                 out_size=64)
    assert out.shape == (3, 64, 64, 3)
    # a constant image stays constant under any in-bounds crop+resize
    assert float(jnp.min(out)) > 0.95, "crop read outside the image"


def test_gaussian_blur_matches_naive_separable_reference():
    """The depthwise-conv blur equals a naive numpy edge-padded separable
    convolution with the same per-sample kernels."""
    from aqualora_tpu.distort import noises

    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3)
                    .astype(np.float32))
    size, sig_lo, sig_hi = 5, 1.0, 3.0
    out = np.asarray(noises.gaussian_blur(key, x, sigma_max=sig_hi,
                                          sigma_min=sig_lo, size=size))
    # reproduce the kernels exactly as gaussian_blur builds them
    sigma = np.asarray(jax.random.uniform(key, (2,), minval=sig_lo,
                                          maxval=sig_hi))
    off = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    ref = np.empty_like(out)
    for b in range(2):
        k = np.exp(-0.5 * (off / sigma[b]) ** 2)
        k /= k.sum()
        img = np.asarray(x[b])
        p = np.pad(img, ((size // 2,) * 2, (0, 0), (0, 0)), mode="edge")
        v = np.stack([np.stack([np.convolve(p[:, j, c], k, mode="valid")
                                for c in range(3)], -1)
                      for j in range(16)], 1)
        p = np.pad(v, ((0, 0), (size // 2,) * 2, (0, 0)), mode="edge")
        ref[b] = np.stack([np.stack([np.convolve(p[i, :, c], k, "valid")
                                     for c in range(3)], -1)
                           for i in range(16)], 0)
    np.testing.assert_allclose(out, ref, atol=1e-5)
