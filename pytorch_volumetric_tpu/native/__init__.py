"""ctypes bindings for the native host-side geometry runtime (C++ BVH).

The library is compiled on first use with the system toolchain (g++) and
cached next to the source; everything degrades gracefully to the pure-Python
paths if no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pvt_native.cpp")
_LIB = os.path.join(_DIR, "libpvt_native.so")
_LOCK = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:  # noqa: BLE001 - any failure -> python fallback
        logger.warning("native build failed (%s); using pure-python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _LOCK:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.pvt_scene_create.restype = ctypes.c_void_p
        lib.pvt_scene_create.argtypes = [ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_int64]
        lib.pvt_scene_destroy.argtypes = [ctypes.c_void_p]
        lib.pvt_closest_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float]
        lib.pvt_build_cell_table.restype = ctypes.c_int64
        lib.pvt_build_cell_table.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        lib.pvt_parse_obj.restype = ctypes.c_int
        lib.pvt_parse_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeScene:
    """BVH-accelerated host-side closest-point/winding queries (the Open3D
    ``RaycastingScene`` counterpart; reference sdf.py:115-154)."""

    def __init__(self, triangles: np.ndarray):
        """``triangles``: [F, 3, 3] float32 corner coordinates."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        tris = np.ascontiguousarray(triangles, dtype=np.float32)
        self.num_faces = len(tris)
        if self.num_faces == 0:
            raise ValueError("cannot build a scene from an empty mesh "
                             "(no faces)")
        self._handle = lib.pvt_scene_create(
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_faces)
        if not self._handle:
            raise RuntimeError("native scene construction failed")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.pvt_scene_destroy(self._handle)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass

    def closest_query(self, points: np.ndarray, winding_beta: float = 2.0
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns ``(dist [N] unsigned, closest [N, 3], fid [N], winding [N])``
        — the same contract as ``ops.point_triangle.mesh_closest_query``."""
        pts = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
        n = len(pts)
        closest = np.empty((n, 3), dtype=np.float32)
        dist = np.empty((n,), dtype=np.float32)
        fid = np.empty((n,), dtype=np.int32)
        wind = np.empty((n,), dtype=np.float32)
        self._lib.pvt_closest_query(
            self._handle, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            closest.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            wind.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(winding_beta))
        return dist, closest, fid, wind


def build_cell_table(triangles: np.ndarray, lo: np.ndarray, res: np.ndarray,
                     dims: np.ndarray, radius: np.ndarray,
                     max_k: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Per-cell candidate triangle lists for narrow-band SDF grids.

    ``radius [C]``: candidate radius per cell (< 0 skips the cell).  Returns
    ``(ids [C, K] int32 with -1 padding, counts [C] int32)`` where ``K`` is
    the max candidate count (capped at ``max_k``).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    tris = np.ascontiguousarray(triangles, dtype=np.float32)
    lo = np.ascontiguousarray(lo, dtype=np.float32)
    res = np.ascontiguousarray(res, dtype=np.float32)
    dims = np.ascontiguousarray(dims, dtype=np.int32)
    radius = np.ascontiguousarray(radius, dtype=np.float32)
    C = int(np.prod(dims))
    counts = np.zeros(C, dtype=np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    args = (tris.ctypes.data_as(f32p), len(tris), lo.ctypes.data_as(f32p),
            res.ctypes.data_as(f32p), dims.ctypes.data_as(i32p),
            radius.ctypes.data_as(f32p))
    k = lib.pvt_build_cell_table(*args, None, 0,
                                 counts.ctypes.data_as(i32p))
    k = int(min(k, max_k))
    if k == 0:
        return np.full((C, 1), -1, dtype=np.int32), counts
    ids = np.empty((C, k), dtype=np.int32)
    lib.pvt_build_cell_table(*args, ids.ctypes.data_as(i32p), k,
                             counts.ctypes.data_as(i32p))
    return ids, np.minimum(counts, k)


def parse_obj_native(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fast two-pass OBJ parse; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.pvt_parse_obj(path.encode(), None, ctypes.byref(nv), None,
                           ctypes.byref(nf))
    if rc != 0:
        return None
    vertices = np.empty((nv.value, 3), dtype=np.float32)
    faces = np.empty((nf.value, 3), dtype=np.int32)
    rc = lib.pvt_parse_obj(
        path.encode(), vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nv), faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nf))
    if rc != 0:
        return None
    return vertices, faces
