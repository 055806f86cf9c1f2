"""FID computation (replaces the vendored `evaluation/pytorch_fid/`).

Activation statistics (mu, sigma) from InceptionV3 pool3 features and the
Frechet distance with scipy's matrix sqrt on host
(`pytorch_fid/fid_score.py:96,160,257`).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aqualora_tpu.models.inception import InceptionV3Features


def _resize299(x: jnp.ndarray) -> jnp.ndarray:
    """[...,H,W,3] -> [...,299,299,3].  antialias=False to match
    pytorch_fid's F.interpolate(bilinear) resize (inception.py
    resize_input) — FID is sensitive to the resize kernel, and jax's
    default antialias=True would diverge from every reference FID."""
    if x.shape[-3:-1] == (299, 299):
        return x
    return jax.image.resize(x, x.shape[:-3] + (299, 299, 3), "bilinear",
                            antialias=False)


def _padded_batches(images01, batch_size: int):
    """Yield ([batch_size,H,W,3] float chunk, n_valid) pairs from either an
    [N,H,W,3] array or an iterable of single [H,W,3] images (streamed —
    the 5000-image protocol never materializes the whole set on host).
    Mixed-size images are resized to 299 individually before stacking."""
    def _pad(chunk):
        n = len(chunk)
        if n < batch_size:
            chunk = np.concatenate(
                [chunk, np.zeros((batch_size - n,) + chunk.shape[1:],
                                 chunk.dtype)])
        return chunk, n

    if hasattr(images01, "shape"):          # in-memory array
        for i in range(0, len(images01), batch_size):
            yield _pad(np.asarray(images01[i:i + batch_size]))
        return
    buf = []
    def _flush():
        if len({im.shape for im in buf}) > 1:
            resized = [np.asarray(_resize299(jnp.asarray(im)))
                       for im in buf]
            return _pad(np.stack(resized))
        return _pad(np.stack(buf))

    for im in images01:                      # streamed iterable
        buf.append(np.asarray(im, np.float32))
        if len(buf) == batch_size:
            yield _flush()
            buf = []
    if buf:
        yield _flush()


class InceptionExtractor:
    """Batched pool3 feature extraction, jitted once."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = InceptionV3Features(dtype=dtype)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 299, 299, 3)))
        self.variables = params
        self._dev_variables = None   # device_put once, lazily (see __call__)
        self._mesh_variables = None  # per-mesh replicated cache
        self._mesh = None
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, images01, batch_size: int = 32) -> np.ndarray:
        """images01: [N,H,W,3] in [0,1] (or a streamed iterable of
        [H,W,3] images) -> [N, 2048] features.

        Tail chunks are zero-padded to batch_size (one static shape, no
        retrace) and batches shard over a data mesh on multi-chip hosts
        (no-op on one device) — the 5000-image FID protocol is the
        eval step that benefits most from DP."""
        from aqualora_tpu.core import sharding as sh
        mesh = sh.data_mesh_or_none(batch_size)
        if mesh is not None:
            # replicate ONCE per mesh: fid_given_paths calls the same
            # extractor for both directories (5000 images each) — a
            # fresh ~95 MB weight upload per call is pure waste
            if self._mesh_variables is None or self._mesh != mesh:
                self._mesh_variables = sh.replicate(mesh, self.variables)
                self._mesh = mesh
            variables = self._mesh_variables
        else:
            # device_put ONCE: host-numpy leaves (the inception_from_torch
            # path) passed as jit args would re-upload ~95 MB per chunk.
            if self._dev_variables is None:
                self._dev_variables = jax.device_put(self.variables)
            variables = self._dev_variables
        feats = []
        for chunk, n in _padded_batches(images01, batch_size):
            x = _resize299(jnp.asarray(chunk))
            x = x * 2.0 - 1.0                    # FID normalization
            if mesh is not None:
                x = sh.shard_batch(mesh, x)
            feats.append(np.asarray(self._fn(variables, x))[:n])
        if not feats:
            return np.zeros((0, 2048), np.float32)
        return np.concatenate(feats, axis=0)


def activation_statistics(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """pytorch_fid/fid_score.py:160 — scipy sqrtm on host."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    def _sqrtm(m):
        # disp=False matches pytorch_fid (fid_score.py:160) and silences
        # the pre-1.17 "result may be inaccurate" stdout print for the
        # near-singular covariances FID routinely produces; scipy 1.17
        # deprecates the kwarg (warning suppressed), 1.18 removes it.
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            # LinAlgWarning ("matrix is singular") fires routinely on FID's
            # near-singular covariances; pytorch_fid silences it via
            # disp=False, and the non-finite case is handled by the eps
            # offset in frechet_distance below
            warnings.simplefilter("ignore", linalg.LinAlgWarning)
            try:
                r = linalg.sqrtm(m, disp=False)   # (X, errest) pre-1.18
            except TypeError:
                r = linalg.sqrtm(m)               # scipy >= 1.18
        return r[0] if isinstance(r, tuple) else r

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        # pytorch_fid's sanity check (fid_score.py:205-209): a large
        # imaginary diagonal means the covariance product is numerically
        # broken (e.g. far too few images for the 2048-d covariance) —
        # fail loudly instead of printing a meaningless FID
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def _load_images(path: str, limit: Optional[int] = None) -> Iterable[np.ndarray]:
    from PIL import Image
    files = sorted(sum((glob.glob(os.path.join(path, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))
    if limit:
        files = files[:limit]
    for f in files:
        img = Image.open(f)
        if img.mode != "RGB":
            img = img.convert("RGB")
        yield np.asarray(img, np.uint8).astype(np.float32) / 255.0


def fid_given_paths(path1: str, path2: str, batch_size: int = 32,
                    limit: Optional[int] = None,
                    extractor: Optional[InceptionExtractor] = None) -> float:
    """calculate_fid_given_paths equivalent (fid_score.py:257)."""
    ex = extractor or InceptionExtractor()
    stats = []
    for p in (path1, path2):
        if p.endswith(".npz"):
            with np.load(p) as f:
                stats.append((f["mu"], f["sigma"]))
            continue
        feats = ex(_load_images(p, limit), batch_size)   # streamed
        if len(feats) == 0:
            raise FileNotFoundError(f"no images under {p}")
        stats.append(activation_statistics(feats))
    (m1, s1), (m2, s2) = stats
    return frechet_distance(m1, s1, m2, s2)


def main():
    """CLI parity with the vendored pytorch_fid (`python -m pytorch_fid
    path1 path2`, evaluation/pytorch_fid/__main__.py): two image dirs
    (or precomputed .npz mu/sigma), prints the FID.  --save-stats mode
    precomputes an .npz like pytorch_fid's."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("paths", nargs=2)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--save-stats", action="store_true",
                   help="treat paths as (image_dir, out.npz): compute and "
                        "save mu/sigma instead of a FID")
    p.add_argument("--torch-weights", type=str, default=None,
                   help="pt_inception .pth to import via "
                        "tools/torch_import.inception_from_torch")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="permit a randomly initialized Inception (smoke "
                        "tests only — the FID is meaningless)")
    args = p.parse_args()
    params = None
    if args.torch_weights:
        from aqualora_tpu.tools.torch_import import inception_from_torch
        params = inception_from_torch(args.torch_weights)
    elif not args.allow_random_weights:
        # pytorch_fid always runs pretrained weights; a silent random-init
        # fallback would print a plausible-looking but meaningless FID.
        p.error("no Inception weights: pass --torch-weights "
                "pt_inception-*.pth (or --allow-random-weights for a "
                "smoke run whose FID is meaningless)")
    ex = InceptionExtractor(params=params)
    if args.save_stats:
        feats = ex(_load_images(args.paths[0], args.limit),
                   args.batch_size)                      # streamed
        if len(feats) == 0:
            p.error(f"no images under {args.paths[0]}")
        mu, sigma = activation_statistics(feats)
        np.savez(args.paths[1], mu=mu, sigma=sigma)
        print(f"saved stats for {len(feats)} images -> {args.paths[1]}")
        return
    fid = fid_given_paths(args.paths[0], args.paths[1],
                          batch_size=args.batch_size, limit=args.limit,
                          extractor=ex)
    print(f"FID: {fid:.6f}")


if __name__ == "__main__":
    main()
