"""ctypes bindings for the native data-pipeline library.

Auto-builds ``native/libdiffreg_native.so`` on first use (g++, ~1s) and
falls back to the numpy/scipy twins when unavailable. Public API matches
``ops.subsample.grid_subsample_np`` / ``ops.neighbors.radius_neighbors_np``.
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

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.abspath(os.path.join(_NATIVE_DIR, "libdiffreg_native.so"))
        if not os.path.exists(so):
            try:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.grid_subsample.restype = ctypes.c_int32
        lib.grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.radius_search_knn.restype = None
        lib.radius_search_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_float, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample_native(points: np.ndarray, voxel_size: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..ops.subsample import grid_subsample_np

        return grid_subsample_np(points, voxel_size)
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    n = lib.grid_subsample(_fptr(pts), np.int32(len(pts)),
                           np.float32(voxel_size), _fptr(out))
    return out[:n].copy()


def radius_neighbors_native(queries: np.ndarray, supports: np.ndarray,
                            radius: float, k: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..ops.neighbors import radius_neighbors_np

        return radius_neighbors_np(queries, supports, radius, k)
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    out = np.empty((len(q), k), np.int32)
    lib.radius_search_knn(
        _fptr(q), np.int32(len(q)), _fptr(s), np.int32(len(s)),
        np.float32(radius), np.int32(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
