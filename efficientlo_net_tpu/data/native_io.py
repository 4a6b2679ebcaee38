"""ctypes bindings for the native IO runtime (native/lidar_io.cpp).

Falls back to numpy when the shared library hasn't been built; build with
``make -C native``.  The native path exists because the reference's input
pipeline is synchronous single-threaded Python (SURVEY.md §3.1) — here scan
decoding is parallel C++ with the GIL released.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libefficientlo_io.so"),
]

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            lib.elo_read_scan.restype = ctypes.c_int64
            lib.elo_read_scan.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            lib.elo_read_batch.restype = ctypes.c_int32
            lib.elo_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            lib.elo_abi_version.restype = ctypes.c_int32
            if lib.elo_abi_version() == 1:
                _lib = lib
                return _lib
    return None


def available() -> bool:
    return _load() is not None


def read_scan(path: str, num_points: int) -> np.ndarray:
    """(num_points, 3) float32, zero-padded.  Native if available."""
    lib = _load()
    if lib is None:
        return _read_scan_numpy(path, num_points)
    out = np.zeros((num_points, 3), dtype=np.float32)
    n = lib.elo_read_scan(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_points,
    )
    if n < 0:
        raise FileNotFoundError(path)
    return out


def read_batch(paths: List[str], num_points: int, num_threads: int = 8) -> np.ndarray:
    """(len(paths), num_points, 3) float32, parallel native decode."""
    lib = _load()
    if lib is None:
        return np.stack([_read_scan_numpy(p, num_points) for p in paths])
    b = len(paths)
    out = np.zeros((b, num_points, 3), dtype=np.float32)
    counts = np.zeros((b,), dtype=np.int64)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    rc = lib.elo_read_batch(
        arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_points, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads,
    )
    if rc != 0:
        bad = [paths[i] for i in range(b) if counts[i] < 0]
        raise FileNotFoundError(f"failed to read scans: {bad}")
    return out


def _read_scan_numpy(path: str, num_points: int) -> np.ndarray:
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
    out = np.zeros((num_points, 3), dtype=np.float32)
    out[: min(len(pts), num_points)] = pts[:num_points]
    return out
