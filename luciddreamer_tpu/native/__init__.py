"""Native (C++) host-side runtime components, loaded via ctypes.

Build happens lazily on first use (g++ -O3 -shared) and is cached next to
the source; everything degrades gracefully to numpy implementations when no
compiler is available.  See knn_native.cpp for what lives here and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(os.path.dirname(__file__), "knn_native.cpp")
        out = os.path.join(os.path.dirname(__file__), "_knn_native.so")
        try:
            if (not os.path.exists(out)
                    or os.path.getmtime(out) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", src, "-o", out],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(out)
            lib.mean_sq_dist_3nn.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.morton3d.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.morton_subsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _cptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def mean_sq_dist_3nn_cpu(points: np.ndarray) -> np.ndarray:
    """(n, 3) -> (n,) mean of squared distances to the 3 nearest neighbors.
    Exact (KD-tree).  Falls back to numpy brute force if unbuilt."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _build_and_load()
    if lib is None:
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        part = np.partition(d2, 2, axis=1)[:, :3]
        part[~np.isfinite(part)] = 0.0
        return part.sum(1) / 3.0
    out = np.empty(n, np.float32)
    lib.mean_sq_dist_3nn(_cptr(pts, ctypes.c_float), n,
                         _cptr(out, ctypes.c_float))
    return out


def morton_codes(points: np.ndarray) -> np.ndarray:
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    out = np.empty(n, np.uint64)
    lib.morton3d(_cptr(pts, ctypes.c_float), n, _cptr(out, ctypes.c_uint64))
    return out


def morton_subsample(points: np.ndarray, m: int) -> np.ndarray:
    """Spatially stratified subsample of m point indices (Morton-ordered
    decimation) — better coverage than random choice for huge clouds."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lib = _build_and_load()
    if lib is None:
        return np.linspace(0, n - 1, min(m, n)).astype(np.int64)
    out = np.empty(min(m, n), np.int64)
    k = lib.morton_subsample(_cptr(pts, ctypes.c_float), n, m,
                             _cptr(out, ctypes.c_int64))
    return out[:k]
