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


def test_native_jpeg_roundtrip_matches_pil_bitwise():
    """jpeg_roundtrip_batch (threaded libjpeg encode+decode) is
    BIT-IDENTICAL to PIL's save/open at the protocol quality 50 — both
    ride the same libjpeg defaults, so the eval robustness benchmark's
    real-JPEG attack is unchanged by the native path."""
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (5, 48, 64, 3)).astype(np.uint8)
    out = native_loader.jpeg_roundtrip_batch(imgs, 50)
    if out is None:
        import pytest
        pytest.skip("native library unavailable")
    assert out.shape == imgs.shape and out.dtype == np.uint8
    for i in range(len(imgs)):
        buf = io.BytesIO()
        Image.fromarray(imgs[i]).save(buf, format="JPEG", quality=50)
        buf.seek(0)
        ref = np.asarray(Image.open(buf), np.uint8)
        np.testing.assert_array_equal(out[i], ref)


def test_eval_jpeg_compress_uses_native_parity():
    """eval/distortions.jpeg_compress output equals the PIL reference
    implementation regardless of which backend ran."""
    import io

    from PIL import Image

    from aqualora_tpu.eval.distortions import jpeg_compress

    rng = np.random.default_rng(3)
    x01 = rng.random((3, 40, 56, 3)).astype(np.float32)
    got = jpeg_compress(x01, None)
    u8 = (x01 * 255).clip(0, 255).astype(np.uint8)
    ref = []
    for img in u8:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=50)
        buf.seek(0)
        ref.append(np.asarray(Image.open(buf), np.uint8))
    np.testing.assert_allclose(got, np.stack(ref).astype(np.float32) / 255.0)


def test_native_jpeg_roundtrip_rejects_non_uint8():
    """Float images must be rejected, not truncated mod 256 into
    near-black garbage that silently poisons the real-JPEG attack."""
    import pytest

    from aqualora_tpu.core.native_loader import get_lib, jpeg_roundtrip_batch

    if get_lib() is None:
        pytest.skip("native loader unavailable")
    with pytest.raises(ValueError, match="uint8"):
        jpeg_roundtrip_batch(np.random.rand(2, 16, 16, 3).astype(np.float32),
                             50)
    with pytest.raises(ValueError, match="N,H,W,3"):
        jpeg_roundtrip_batch(np.zeros((2, 16, 16, 4), np.uint8), 50)
