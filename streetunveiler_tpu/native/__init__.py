"""Native (C++) host-side runtime kernels, loaded via ctypes.

The reference ships its host hot paths as native extensions (simple-knn,
superpose3d's C backend, ZITS++ NMS — SURVEY.md §2.3); this package is the
TPU build's equivalent for the host side: a single shared library
(``src/su_native.cpp``) with KNN statistics, radius-graph clustering and
semantic voxel downsampling, each ~10-100x the numpy/scipy fallback on
multi-million-point driving clouds.

The library auto-builds on first import when a compiler is present
(``g++ -O3 -fopenmp``); every caller keeps a pure-Python fallback so the
package works without a toolchain. ``available()`` reports which path is
active; set ``SU_NATIVE=0`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "su_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libsu_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=180)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:
        # retry without OpenMP / -march (portability)
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB_PATH]
        try:
            r = subprocess.run(cmd, capture_output=True, timeout=180)
        except (OSError, subprocess.TimeoutExpired):
            return False
    return r.returncode == 0


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SU_NATIVE", "1") == "0":
            return None
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.su_knn_mean_sq_dist3.argtypes = [f32p, ctypes.c_int64, f32p]
        lib.su_knn_mean_dist_ref.argtypes = [f32p, ctypes.c_int64, f32p,
                                             ctypes.c_int64,
                                             ctypes.c_int32, f32p]
        lib.su_cluster_radius.argtypes = [f32p, ctypes.c_int64,
                                          ctypes.c_float, i32p]
        lib.su_cluster_radius.restype = ctypes.c_int64
        lib.su_voxel_downsample.argtypes = [f32p, f32p, i32p,
                                            ctypes.c_int64, ctypes.c_float,
                                            ctypes.c_float, f32p, f32p,
                                            i32p]
        lib.su_voxel_downsample.restype = ctypes.c_int64
        lib.su_version.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32c(a):
    return np.ascontiguousarray(a, np.float32)


def _ptr(a, typ=ctypes.c_float):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def knn_mean_sq_dist3(points: np.ndarray) -> np.ndarray | None:
    """Mean squared distance to the 3 nearest neighbors, or None if the
    native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    pts = _f32c(points)
    out = np.empty(pts.shape[0], np.float32)
    lib.su_knn_mean_sq_dist3(_ptr(pts), pts.shape[0], _ptr(out))
    return out


def knn_mean_dist_ref(query: np.ndarray, reference: np.ndarray,
                      k: int = 3) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    q = _f32c(query)
    r = _f32c(reference)
    out = np.empty(q.shape[0], np.float32)
    lib.su_knn_mean_dist_ref(_ptr(q), q.shape[0], _ptr(r), r.shape[0],
                             k, _ptr(out))
    return out


def cluster_radius(points: np.ndarray, radius: float) -> np.ndarray | None:
    """Connected components of the radius graph → per-point root labels
    (arbitrary consistent ids), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = _f32c(points)
    labels = np.empty(pts.shape[0], np.int32)
    lib.su_cluster_radius(_ptr(pts), pts.shape[0], radius,
                          _ptr(labels, ctypes.c_int32))
    return labels


def voxel_downsample(points, colors, semantics, voxel: float,
                     agreement: float = 0.8):
    """Voxel-mean downsample with semantic majority vote; returns
    (points, colors, semantics) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = _f32c(points)
    rgb = _f32c(colors)
    sem = np.ascontiguousarray(semantics, np.int32)
    n = pts.shape[0]
    kept = lib.su_voxel_downsample(_ptr(pts), _ptr(rgb),
                                   _ptr(sem, ctypes.c_int32), n, voxel,
                                   agreement, None, None, None)
    out_p = np.empty((kept, 3), np.float32)
    out_c = np.empty((kept, 3), np.float32)
    out_s = np.empty(kept, np.int32)
    lib.su_voxel_downsample(_ptr(pts), _ptr(rgb),
                            _ptr(sem, ctypes.c_int32), n, voxel, agreement,
                            _ptr(out_p), _ptr(out_c),
                            _ptr(out_s, ctypes.c_int32))
    return out_p, out_c, out_s
