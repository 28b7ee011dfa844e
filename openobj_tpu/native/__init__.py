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
_louvain_lib = None
_louvain_tried = False


def _build_so(src: str, lib_path: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             src, "-o", lib_path],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _build() -> bool:
    return _build_so(_SRC, _LIB_PATH)


def _load_so(src: str, lib_path: str):
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        if not _build_so(src, lib_path):
            return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        return None


def load():
    """Returns the ctypes library or None when unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    lib = _load_so(_SRC, _LIB_PATH)
    if lib is None:
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
    lib.voxel_flood_largest.restype = ctypes.c_int64
    lib.voxel_flood_largest.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.felz_union_find.restype = ctypes.c_int
    lib.felz_union_find.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
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
    # start modestly — iso-surfaces touch a small fraction of cubes, and a
    # worst-case preallocation (2 verts + 4 faces per cube) costs ~36x the
    # grid itself (~1.6 GB at 320^3); the x4 retry loop bounds the wasted
    # recompute when a dense field really does overflow
    cap = max(1 << 16, int(v.size) // 8)
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


def felz_union_find(edges_a: np.ndarray, edges_b: np.ndarray,
                    weights: np.ndarray, n_px: int, k: float,
                    min_size: int):
    """Felzenszwalb merge pass over pre-sorted edges -> per-pixel root
    labels, or None when the native library is unavailable (caller falls
    back to the Python loop in perception/segmentation.py)."""
    lib = load()
    if lib is None:
        return None
    ea = np.ascontiguousarray(edges_a, np.int64)
    eb = np.ascontiguousarray(edges_b, np.int64)
    ws = np.ascontiguousarray(weights, np.float64)
    labels = np.empty(n_px, np.int64)
    r = lib.felz_union_find(
        ea.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ea), n_px, ctypes.c_double(k), min_size,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if r != 0:
        return None
    return labels


def dbscan_largest_raw(points: np.ndarray, eps: float, min_points: int,
                       large_n: int = 100_000):
    """Largest-cluster keep mask, or None when no cluster exists (or the
    native library is unavailable). Clouds above ``large_n`` points use the
    O(n) voxel flood-fill variant: exact grid DBSCAN scans every point in
    each eps-cell, which explodes on dense surface clouds whenever eps far
    exceeds the point spacing (the adaptive-eps denoise regime)."""
    lib = load()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, dtype=np.float64)
    mask = np.zeros(len(p), np.uint8)
    fn = (lib.voxel_flood_largest if len(p) > large_n
          else lib.grid_dbscan_largest)
    kept = fn(
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


# --------------------------------------------------------------------------- #
# Louvain community detection (louvain.cc)
# --------------------------------------------------------------------------- #


def load_louvain():
    global _louvain_lib, _louvain_tried
    if _louvain_lib is not None:
        return _louvain_lib
    if _louvain_tried:
        return None
    _louvain_tried = True
    src = os.path.join(_DIR, "louvain.cc")
    lib = _load_so(src, os.path.join(_DIR, "_louvain.so"))
    if lib is None:
        return None
    lib.louvain.restype = ctypes.c_int64
    lib.louvain.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
    ]
    _louvain_lib = lib
    return lib


def louvain_labels(
    edges_i: np.ndarray,
    edges_j: np.ndarray,
    edges_w: np.ndarray,
    n_nodes: int,
    resolution: float = 1.0,
    seed: int = 0,
) -> np.ndarray | None:
    """Community label per node from weighted undirected edges, via the
    native Louvain (louvain.cc). None when the library is unavailable —
    callers fall back to networkx (perception.graph.louvain_cluster)."""
    lib = load_louvain()
    if lib is None:
        return None
    ei = np.ascontiguousarray(edges_i, np.int64)
    ej = np.ascontiguousarray(edges_j, np.int64)
    ew = np.ascontiguousarray(edges_w, np.float64)
    labels = np.empty(n_nodes, np.int64)
    k = lib.louvain(
        ei.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ej.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ew.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ei), n_nodes, ctypes.c_double(resolution),
        ctypes.c_uint64(seed), labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if k < 0:
        raise ValueError("louvain: edge index out of range")
    return labels
