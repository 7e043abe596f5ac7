"""ctypes binding for graph-based segmentation (felzenszwalb.cpp).

Compiles the shared library on first use with g++ (cached next to the
source). `available()` reports whether the native path can load; callers
(semantic/embedder.py) fall back to grid masks when it can't.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "felzenszwalb.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libfelzenszwalb.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    lib.felzenszwalb_segment.restype = ctypes.c_int32
    lib.felzenszwalb_segment.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def segment(image: np.ndarray, k: float = 100.0, min_size: int = 100,
            sigma: float = 0.8) -> tuple[np.ndarray, int]:
    """Segment an (H, W, C) float image into connected regions.

    Returns (labels (H, W) int32 with compact ids 0..n-1, n). `k` sets the
    observation scale (larger -> larger components); weights are Euclidean
    distance in the image's value units (pass [0,255]-scaled images for
    k values comparable to the published parameterization).
    """
    lib = _load()
    img = np.ascontiguousarray(image, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    labels = np.empty((H, W), dtype=np.int32)
    n = lib.felzenszwalb_segment(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(H), np.int32(W), np.int32(C), np.float32(k),
        np.int32(min_size), np.float32(sigma),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        raise ValueError(f"bad image shape {image.shape}")
    return labels, int(n)
