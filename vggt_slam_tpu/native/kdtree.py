"""ctypes binding for the native KD-tree (vggt_slam_tpu/native/kdtree.cpp).

Compiles the shared library on first use with g++ (cached next to the
source); falls back to scipy.spatial.cKDTree if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "kdtree.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libkdtree.so")
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
    lib.kdtree_build.restype = ctypes.c_void_p
    lib.kdtree_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.kdtree_query.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    lib.kdtree_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


class KDTree:
    """3-D nearest-neighbor index over (N, 3) float32 points."""

    def __init__(self, points: np.ndarray):
        lib = _load()
        self._pts = np.ascontiguousarray(points, dtype=np.float32)
        if self._pts.ndim != 2 or self._pts.shape[1] != 3:
            raise ValueError(f"points must be (N, 3), got {self._pts.shape}")
        self._lib = lib
        self._handle = lib.kdtree_build(
            self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(self._pts.shape[0]))

    def query(self, queries: np.ndarray):
        """Returns (dists (M,), indices (M,)) of the nearest stored point."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = q.shape[0]
        dists = np.empty(m, dtype=np.float32)
        idx = np.empty(m, dtype=np.int32)
        self._lib.kdtree_query(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.int32(m), dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return dists, idx

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.kdtree_free(self._handle)
            self._handle = None
