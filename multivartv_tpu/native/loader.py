"""ctypes loader for the native host engine (native/mvtv_native.cpp).

Builds libmvtv_native.so on first use (simple `make`, g++ only) and falls
back gracefully — every native entry point has a NumPy equivalent, so the
framework works without a toolchain; the native path is a host-side
performance feature (kd-tree NN for irregular meshes, OpenMP binning).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmvtv_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        pd = ctypes.POINTER(ctypes.c_double)
        pi32 = ctypes.POINTER(ctypes.c_int32)
        pi64 = ctypes.POINTER(ctypes.c_int64)
        lib.mvtv_nearest_kdtree.argtypes = [pd, i64, pd, i64, i32, pi32]
        lib.mvtv_nearest_kdtree.restype = ctypes.c_int
        lib.mvtv_nearest_brute.argtypes = [pd, i64, pd, i64, i32, pi32]
        lib.mvtv_nearest_brute.restype = ctypes.c_int
        lib.mvtv_bin_regular.argtypes = [pd, i64, i32, pd, pd, pi64, pi64]
        lib.mvtv_bin_regular.restype = ctypes.c_int
        lib.mvtv_native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_c(a, dtype):
    return np.ascontiguousarray(a, dtype=dtype)


def nearest_kdtree(data: np.ndarray, mesh: np.ndarray) -> Optional[np.ndarray]:
    """Nearest mesh-row index per datum (reference tie-break: lowest
    index).  Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = _as_c(data, np.float64)
    if data.ndim == 1:
        data = data[:, None]
    mesh = _as_c(mesh, np.float64)
    n, p = data.shape
    out = np.empty(n, np.int32)
    rc = lib.mvtv_nearest_kdtree(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        mesh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), mesh.shape[0],
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def nearest_brute(data: np.ndarray, mesh: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = _as_c(data, np.float64)
    if data.ndim == 1:
        data = data[:, None]
    mesh = _as_c(mesh, np.float64)
    n, p = data.shape
    out = np.empty(n, np.int32)
    rc = lib.mvtv_nearest_brute(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        mesh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), mesh.shape[0],
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out if rc == 0 else None


def bin_regular(data: np.ndarray, knot0: np.ndarray, spacing: np.ndarray,
                dims) -> Optional[np.ndarray]:
    """C-order flat nearest-knot index on a regular lattice."""
    lib = _load()
    if lib is None:
        return None
    data = _as_c(data, np.float64)
    if data.ndim == 1:
        data = data[:, None]
    n, p = data.shape
    knot0 = _as_c(knot0, np.float64)
    inv_h = np.where(np.asarray(spacing) > 0, 1.0 / np.asarray(spacing), 0.0)
    inv_h = _as_c(inv_h, np.float64)
    dims = _as_c(dims, np.int64)
    out = np.empty(n, np.int64)
    rc = lib.mvtv_bin_regular(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, p,
        knot0.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inv_h.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out if rc == 0 else None
