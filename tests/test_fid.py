"""FID pipeline tests (Inception pool3 shape, Frechet distance sanity)."""

import numpy as np

from aqualora_tpu.eval.fid import (InceptionExtractor, activation_statistics,
                                   frechet_distance)


def test_frechet_identity_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(64, 16)
    mu, sigma = activation_statistics(f)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_known_value():
    """For two Gaussians N(m1, I), N(m2, I): FID == |m1 - m2|^2."""
    d = 8
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    sigma = np.eye(d)
    fid = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(fid, 4.0 * d, rtol=1e-6)


def test_inception_features_shape():
    ex = InceptionExtractor()
    imgs = np.random.RandomState(0).rand(3, 64, 64, 3).astype(np.float32)
    feats = ex(imgs, batch_size=2)
    assert feats.shape == (3, 2048)
    assert np.isfinite(feats).all()


def test_fid_discriminates():
    ex = InceptionExtractor()
    rng = np.random.RandomState(0)
    a = rng.rand(8, 64, 64, 3).astype(np.float32)
    b = np.clip(a + 0.5, 0, 1)
    fa = ex(a, 4)
    fb = ex(b, 4)
    fid_ab = frechet_distance(*activation_statistics(fa),
                              *activation_statistics(fb))
    fid_aa = frechet_distance(*activation_statistics(fa),
                              *activation_statistics(fa))
    assert fid_ab > fid_aa


def test_fid_npz_stats_path(tmp_path):
    """Precomputed .npz mu/sigma inputs (the usual COCO-stats workflow)."""
    import jax
    from aqualora_tpu.eval.fid import fid_given_paths
    from PIL import Image

    rng = np.random.RandomState(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            str(d / f"{i}.png"))
    mu, sigma = np.zeros(2048), np.eye(2048)
    np.savez(str(tmp_path / "stats.npz"), mu=mu, sigma=sigma)
    fid = fid_given_paths(str(d), str(tmp_path / "stats.npz"))
    assert np.isfinite(fid)


def test_extractor_streams_iterables_and_mixed_sizes():
    """Directory-scale inputs stream as an iterable of single images (the
    5000-image protocol never materializes the set); mixed sizes resize
    per image instead of crashing np.stack, and features match the
    in-memory array path exactly for uniform inputs."""
    ex = InceptionExtractor()
    rng = np.random.RandomState(1)
    imgs = rng.rand(5, 64, 64, 3).astype(np.float32)
    f_arr = ex(imgs, batch_size=2)
    f_gen = ex((im for im in imgs), batch_size=2)
    np.testing.assert_array_equal(f_arr, f_gen)
    mixed = [rng.rand(64, 64, 3).astype(np.float32),
             rng.rand(48, 40, 3).astype(np.float32),
             rng.rand(299, 299, 3).astype(np.float32)]
    f_mixed = ex(iter(mixed), batch_size=2)
    assert f_mixed.shape == (3, 2048) and np.isfinite(f_mixed).all()
    assert ex(iter([]), batch_size=2).shape == (0, 2048)


def test_resize_matches_torch_interpolate_no_antialias():
    """The 299 resize must be antialias=False bilinear to match
    pytorch_fid's F.interpolate (inception.py resize_input) — FID is
    sensitive to the resize kernel."""
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from aqualora_tpu.eval.fid import _resize299

    x = np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32)
    ours = np.asarray(_resize299(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(299, 299), mode="bilinear",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)
