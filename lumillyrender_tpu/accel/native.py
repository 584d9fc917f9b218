"""ctypes binding for the native C++ SAH builder (`native/bvh_builder.cpp`).

Builds on demand with `make` if the shared library is missing; callers fall
back to the numpy builder (`accel/sah.py`) on any failure — the two produce
identical trees (enforced by tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .sah import FlatBvh, RangeBvh

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "liblumilly_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.lumilly_bvh_build.restype = ctypes.c_int32
    lib.lumilly_bvh_build.argtypes = [
        ctypes.c_int32, f64, f64, f64, f32, f32, i32, i32,
    ]
    lib.lumilly_bvh_build_ranges.restype = ctypes.c_int32
    lib.lumilly_bvh_build_ranges.argtypes = [
        ctypes.c_int32, ctypes.c_int32, f64, f64, f64, f32, f32, i32, i32,
        i32, i32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build(mins: np.ndarray, maxs: np.ndarray, centers: np.ndarray) -> FlatBvh:
    p = int(mins.shape[0])
    if p == 0:
        from . import sah

        return sah.build(mins, maxs, centers)
    lib = _load()
    mins = np.ascontiguousarray(mins, np.float64)
    maxs = np.ascontiguousarray(maxs, np.float64)
    centers = np.ascontiguousarray(centers, np.float64)
    n = 2 * p - 1
    node_min = np.empty((n, 3), np.float32)
    node_max = np.empty((n, 3), np.float32)
    node_miss = np.empty((n,), np.int32)
    node_leaf = np.empty((n,), np.int32)
    count = lib.lumilly_bvh_build(
        p, mins, maxs, centers, node_min, node_max, node_miss, node_leaf
    )
    if count != n:
        raise RuntimeError(f"native BVH build returned {count}, expected {n}")
    return FlatBvh(
        node_min=node_min, node_max=node_max,
        node_miss=node_miss, node_leaf=node_leaf,
    )


def build_ranges(
    mins: np.ndarray, maxs: np.ndarray, centers: np.ndarray, max_leaf: int
) -> RangeBvh:
    p = int(mins.shape[0])
    if p == 0:
        from . import sah

        return sah.build_ranges(mins, maxs, centers, max_leaf)
    lib = _load()
    mins = np.ascontiguousarray(mins, np.float64)
    maxs = np.ascontiguousarray(maxs, np.float64)
    centers = np.ascontiguousarray(centers, np.float64)
    cap = 2 * p - 1
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    node_miss = np.empty((cap,), np.int32)
    leaf_start = np.empty((cap,), np.int32)
    leaf_count = np.empty((cap,), np.int32)
    perm = np.empty((p,), np.int32)
    count = lib.lumilly_bvh_build_ranges(
        p, max_leaf, mins, maxs, centers, node_min, node_max, node_miss,
        leaf_start, leaf_count, perm,
    )
    if count <= 0:
        raise RuntimeError(f"native BVH range build failed: {count}")
    return RangeBvh(
        node_min=node_min[:count].copy(),
        node_max=node_max[:count].copy(),
        node_miss=node_miss[:count].copy(),
        leaf_start=leaf_start[:count].copy(),
        leaf_count=leaf_count[:count].copy(),
        perm=perm,
    )
