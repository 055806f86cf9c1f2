"""Native C++ image loader: build, decode parity vs PIL, batch API."""

import numpy as np
import pytest
from PIL import Image

from aqualora_tpu.core import native_loader


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png"]):
        arr = (rng.rand(100 + i * 17, 80 + i * 5, 3) * 255).astype(np.uint8)
        p = str(d / f"img{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds_and_decodes(image_files):
    out = native_loader.decode_batch(image_files, 64)
    if out is None:
        pytest.skip("native loader unavailable (no g++/libjpeg)")
    assert out.shape == (3, 64, 64, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0

    # parity vs PIL bicubic within a loose tolerance (different bicubic
    # boundary handling; values are [-1,1])
    for i, p in enumerate(image_files):
        img = Image.open(p).convert("RGB").resize(
            (64, 64), resample=Image.Resampling.BICUBIC)
        ref = np.asarray(img, np.uint8).astype(np.float32) / 127.5 - 1.0
        diff = np.abs(out[i] - ref)
        assert np.median(diff) < 0.05, f"{p}: median diff {np.median(diff)}"


def test_native_missing_file_falls_back():
    out = native_loader.decode_batch(["/nonexistent/file.png"], 32)
    assert out is None


def test_dataset_uses_native(image_files, tmp_path):
    import os
    import shutil

    from aqualora_tpu.train.data import ImageFolderDataset
    d = tmp_path / "ds"
    d.mkdir()
    for p in image_files:
        shutil.copy(p, d)
    ds = ImageFolderDataset(str(d), resolution=32)
    imgs, caps = next(ds.batches(2, epochs=1))
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(imgs).all()
