"""Native (C++) CPU geometry kernels, loaded via ctypes.

Compiled on first use with g++ -O3 into the package directory (cached by
source mtime); every entry point has a pure-numpy fallback in
openobj_tpu.ops.marching / openobj_tpu.utils.geometry, so the framework
works without a toolchain — just slower on the export path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "geometry.cc")
_LIB_PATH = os.path.join(_DIR, "_geometry.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Returns the ctypes library or None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.grid_dbscan_largest.restype = ctypes.c_int64
    lib.grid_dbscan_largest.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def marching_tetrahedra(values: np.ndarray, level: float = 0.5):
    """Native iso-surface extraction; None if no surface. Falls back to the
    numpy implementation when the library is unavailable."""
    lib = load()
    if lib is None:
        from openobj_tpu.ops.marching import marching_tetrahedra as mt

        return mt(values, level)
    v = np.ascontiguousarray(values, dtype=np.float32)
    n0, n1, n2 = v.shape
    # worst case ~ 2 verts + 4 faces per active cube; allocate generously
    # and retry with doubled capacity on overflow
    cap = max(1 << 16, int(v.size * 2))
    for _ in range(4):
        verts = np.empty((cap, 3), np.float64)
        faces = np.empty((cap * 2, 3), np.int64)
        nv = ctypes.c_int64(0)
        nf = ctypes.c_int64(0)
        r = lib.marching_tetrahedra(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n0, n1, n2, ctypes.c_float(level),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), verts.size,
            ctypes.byref(nv),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), faces.size,
            ctypes.byref(nf),
        )
        if r == 0:
            if nf.value == 0:
                return None
            return verts[: nv.value].copy(), faces[: nf.value].copy()
        cap *= 4
    raise RuntimeError("marching_tetrahedra capacity overflow")


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    lib = load()
    if lib is None:
        from openobj_tpu.utils.geometry import voxel_downsample as vd

        return vd(points, voxel)
    p = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty_like(p)
    n = lib.voxel_downsample(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
        ctypes.c_double(voxel),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), out.size,
    )
    if n < 0:
        raise RuntimeError("voxel_downsample overflow")
    return out[:n].astype(points.dtype)


def dbscan_largest_raw(points: np.ndarray, eps: float, min_points: int):
    """Largest-cluster keep mask, or None when no cluster exists (or the
    native library is unavailable)."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, dtype=np.float64)
    mask = np.zeros(len(p), np.uint8)
    kept = lib.grid_dbscan_largest(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(p),
        ctypes.c_double(eps), min_points,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if kept == 0:
        return None
    return mask.astype(bool)


def dbscan_largest_cluster(points: np.ndarray, eps: float, min_points: int):
    """Native largest-cluster filter; (points_kept, keep_mask). Keeps
    everything when no cluster is found."""
    mask = dbscan_largest_raw(points, eps, min_points)
    if mask is None:
        if load() is None:
            from openobj_tpu.perception.projection import (
                dbscan_largest_cluster as d,
            )

            return d(points, eps, min_points, use_native=False)
        return points, np.ones(len(points), bool)
    return points[mask], mask
