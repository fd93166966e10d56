"""Native (C++/OpenMP) host kernels with automatic build + numpy fallback.

`get_native()` returns a ctypes handle to the scene-bake library, building it
with g++ on first use (cached in this package dir). Returns None when no
toolchain is available — callers fall back to the numpy implementation in
envs/geometry.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "scenebake.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_scenebake.so")


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_native():
    """ctypes lib with bake_lidar_field/ray_distances, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.bake_lidar_field.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ray_distances.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_bake_lidar_field(walls: np.ndarray, bbox, cell: float,
                            num_angles: int, max_dist: float):
    """C++ field bake; returns (field (H,W,A), origin) or None if no native."""
    lib = get_native()
    if lib is None:
        return None
    walls = np.ascontiguousarray(walls, dtype=np.float32).reshape(-1, 4)
    xmin, xmax, ymin, ymax = [float(v) for v in bbox]
    W = int(np.ceil((xmax - xmin) / cell))
    H = int(np.ceil((ymax - ymin) / cell))
    out = np.empty((H, W, num_angles), dtype=np.float32)
    lib.bake_lidar_field(
        _fptr(walls), len(walls),
        ctypes.c_float(xmin), ctypes.c_float(ymin), ctypes.c_float(cell),
        H, W, num_angles, ctypes.c_float(max_dist), _fptr(out),
    )
    return np.clip(out, 0.0, max_dist), np.array([xmin, ymin], dtype=np.float32)
