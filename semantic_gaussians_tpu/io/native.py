"""ctypes bindings for the native host runtime (native/src/sgtpu_native.cc).

Auto-builds the .so on first import if a compiler is available; every entry
point has a pure-Python fallback, so the package works without it — the
native path just makes million-Gaussian checkpoint parsing, voxelization
and host-side KNN fast (the reference leans on CUDA + torch DataLoader
workers for the same roles).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _root() -> Path:
    return Path(__file__).resolve().parents[2]


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _root() / "native" / "lib" / "libsgtpu_native.so"
    if not so.exists():
        build = _root() / "native" / "build.sh"
        try:
            subprocess.run(
                [str(build)], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    i64 = ctypes.c_int64
    lib.ply_read_f32.argtypes = [
        ctypes.c_void_p, i64, i64, ctypes.POINTER(i64), i64,
        ctypes.c_void_p, ctypes.c_int,
    ]
    lib.voxelize_points.restype = i64
    lib.voxelize_points.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.knn3_mean_sq.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def ply_gather_f32(
    data: bytes, rows: int, stride: int, offsets: np.ndarray
) -> Optional[np.ndarray]:
    """Gather float32 properties at byte `offsets` from interleaved rows."""
    lib = load_native()
    if lib is None:
        return None
    offs = np.ascontiguousarray(offsets, np.int64)
    out = np.empty((rows, len(offs)), np.float32)
    buf = np.frombuffer(data, np.uint8)
    lib.ply_read_f32(
        buf.ctypes.data_as(ctypes.c_void_p), rows, stride,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(offs),
        out.ctypes.data_as(ctypes.c_void_p), os.cpu_count() or 1,
    )
    return out


def voxelize_native(points: np.ndarray, voxel_size: float):
    """(coords int32 [M,3], first_idx int64 [M], inverse int64 [N]) or None."""
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    n = len(pts)
    coords = np.empty((n, 3), np.int32)
    first_idx = np.empty(n, np.int64)
    inverse = np.empty(n, np.int64)
    m = lib.voxelize_points(
        pts.ctypes.data_as(ctypes.c_void_p), n, float(voxel_size),
        coords.ctypes.data_as(ctypes.c_void_p),
        first_idx.ctypes.data_as(ctypes.c_void_p),
        inverse.ctypes.data_as(ctypes.c_void_p),
    )
    return coords[:m].copy(), first_idx[:m].copy(), inverse


def knn3_native(points: np.ndarray) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    lib.knn3_mean_sq(
        pts.ctypes.data_as(ctypes.c_void_p), len(pts),
        out.ctypes.data_as(ctypes.c_void_p), os.cpu_count() or 1,
    )
    return out
