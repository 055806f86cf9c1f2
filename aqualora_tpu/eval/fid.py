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


class InceptionExtractor:
    """Batched pool3 feature extraction, jitted once."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = InceptionV3Features(dtype=dtype)
        if params is None:
            params = self.model.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 299, 299, 3)))
        self.variables = params
        self._fn = jax.jit(lambda v, x: self.model.apply(v, x))

    def __call__(self, images01: np.ndarray, batch_size: int = 32
                 ) -> np.ndarray:
        """images01: [N,H,W,3] in [0,1] -> [N, 2048] features.

        Tail chunks are zero-padded to batch_size (one static shape, no
        retrace) and batches shard over a data mesh on multi-chip hosts
        (no-op on one device) — the 5000-image FID protocol is the
        eval step that benefits most from DP."""
        import math

        import numpy as _np

        from aqualora_tpu.core import sharding as sh
        n_data = math.gcd(batch_size, jax.device_count())
        mesh = sh.make_mesh(jax.devices()[:n_data]) if n_data > 1 else None
        variables = (sh.replicate(mesh, self.variables)
                     if mesh is not None else self.variables)
        feats = []
        for i in range(0, len(images01), batch_size):
            chunk = _np.asarray(images01[i:i + batch_size])
            n = len(chunk)
            if n < batch_size:
                chunk = _np.concatenate(
                    [chunk, _np.zeros((batch_size - n,) + chunk.shape[1:],
                                      chunk.dtype)])
            x = jax.image.resize(jnp.asarray(chunk),
                                 (batch_size, 299, 299, 3), "bilinear")
            x = x * 2.0 - 1.0                    # FID normalization
            if mesh is not None:
                x = sh.shard_batch(mesh, x)
            feats.append(np.asarray(self._fn(variables, x))[:n])
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
        # scipy >= 1.17 returns a bare array (disp deprecated); older
        # versions return (X, errest) when disp=False
        r = linalg.sqrtm(m)
        return r[0] if isinstance(r, tuple) else r

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
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
        imgs = list(_load_images(p, limit))
        if not imgs:
            raise FileNotFoundError(f"no images under {p}")
        feats = ex(np.stack(imgs), batch_size)
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
    args = p.parse_args()
    params = None
    if args.torch_weights:
        from aqualora_tpu.tools.torch_import import inception_from_torch
        params = inception_from_torch(args.torch_weights)
    ex = InceptionExtractor(params=params)
    if args.save_stats:
        imgs = list(_load_images(args.paths[0], args.limit))
        mu, sigma = activation_statistics(
            ex(np.stack(imgs), args.batch_size))
        np.savez(args.paths[1], mu=mu, sigma=sigma)
        print(f"saved stats for {len(imgs)} images -> {args.paths[1]}")
        return
    fid = fid_given_paths(args.paths[0], args.paths[1],
                          batch_size=args.batch_size, limit=args.limit,
                          extractor=ex)
    print(f"FID: {fid:.6f}")


if __name__ == "__main__":
    main()
