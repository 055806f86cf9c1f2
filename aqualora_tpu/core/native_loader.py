"""ctypes binding for the native C++ image loader
(aqualora_tpu/native/imageloader.cpp) — builds the shared library on first
use and falls back to PIL when the toolchain or libjpeg/libpng are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "imageloader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libimageloader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        # a prebuilt .so without the source file is usable as-is (the
        # staleness check needs both files to exist)
        stale = (os.path.exists(_SRC)
                 and (not os.path.exists(_SO)
                      or os.path.getmtime(_SO) < os.path.getmtime(_SRC)))
        if not os.path.exists(_SO) or stale:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            lib.decode_batch.restype = ctypes.c_int
            lib.jpeg_roundtrip_batch.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int]
            lib.jpeg_roundtrip_batch.restype = ctypes.c_int
            _lib = lib
        except (OSError, AttributeError):
            _failed = True
    return _lib


def decode_batch(paths: List[str], resolution: int,
                 nthreads: int = 0) -> Optional[np.ndarray]:
    """-> [N, res, res, 3] float32 in [-1,1], or None if native unavailable
    or any file failed (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, resolution, resolution, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fails = lib.decode_batch(arr, n, resolution,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             nthreads)
    if fails:
        return None
    return out


def jpeg_roundtrip_batch(images: np.ndarray, quality: int,
                         nthreads: int = 0) -> Optional[np.ndarray]:
    """Threaded in-memory JPEG encode+decode of [N,H,W,3] uint8 RGB
    (libjpeg defaults — bit-identical to PIL's save/open round-trip,
    tests/test_native_loader.py).  None if native unavailable (caller
    falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    images = np.asarray(images)
    if images.dtype != np.uint8:
        # refuse to coerce: float images in [0,1]/[-1,1] would truncate
        # to 0/1 (negatives wrapping mod 256) and the "real JPEG attack"
        # would silently round-trip near-black garbage
        raise ValueError(f"jpeg_roundtrip_batch expects uint8 RGB, got "
                         f"{images.dtype}")
    if images.ndim != 4 or images.shape[-1] != 3:
        raise ValueError(f"expected [N,H,W,3], got {images.shape}")
    imgs = np.ascontiguousarray(images)
    n, h, w, c = imgs.shape
    out = np.empty_like(imgs)
    fails = lib.jpeg_roundtrip_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), n, h, w,
        int(quality), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        nthreads)
    if fails:
        return None
    return out
