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

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATHS = [
    p
    for p in (
        os.environ.get("ELO_NATIVE_LIB"),
        # installed wheel: setup.py builds the library into the package
        os.path.join(_PKG_DIR, "libefficientlo_io.so"),
        # source checkout: `make -C native`
        os.path.join(os.path.dirname(_PKG_DIR), "native",
                     "libefficientlo_io.so"),
    )
    if p
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
            lib.elo_project_scan.restype = None
            lib.elo_project_scan.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_int32,
            ]
            lib.elo_project_batch.restype = None
            lib.elo_project_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_float,
                ctypes.c_int32,
            ]
            lib.elo_abi_version.restype = ctypes.c_int32
            abi = lib.elo_abi_version()
            if abi >= 3:
                # fused crop+augment+project (ABI 3+)
                lib.elo_augment_project_batch.restype = None
                lib.elo_augment_project_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_float,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_float,
                    ctypes.c_float,
                    ctypes.c_int32,
                ]
            if abi >= 2:
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


def project_batch(
    points: np.ndarray,
    height: int,
    width: int,
    sensor,
    crop_radius: float = 0.0,
    num_threads: int = 8,
) -> np.ndarray:
    """Host-side cylindrical projection: (B, N, 3) -> (B, H, W, 3) float32.

    Exact min-range semantics of ``ops.projection.project_to_range_image``
    (method="sort"/"scatter"), computed on the CPU — the on-device scatter
    sits at the TPU's scatter-serialization floor (docs/projection_perf.md),
    so serving paths can project here and ship the dense image instead.
    ``crop_radius > 0`` additionally applies the network's planar crop.
    Falls back to a vectorized numpy implementation without the library.
    """
    import math

    points = np.ascontiguousarray(points, dtype=np.float32)
    b, n = points.shape[0], points.shape[1]
    up = math.radians(sensor.vertical_fov_up_deg)
    down = math.radians(sensor.vertical_fov_down_deg)
    lib = _load()
    if lib is None:
        return np.stack([
            _project_scan_numpy(points[i], height, width, up, down, crop_radius)
            for i in range(b)
        ])
    out = np.zeros((b, height, width, 3), dtype=np.float32)
    lib.elo_project_batch(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), b, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, up, down, crop_radius, num_threads,
    )
    return out


def project_scan(
    points: np.ndarray, height: int, width: int, sensor,
    crop_radius: float = 0.0, num_threads: int = 4,
) -> np.ndarray:
    """Single-scan host projection: (N, 3) -> (H, W, 3) float32.

    Chunk-parallel over ``num_threads`` (per-thread private planes merged
    with index-ordered tie preference — result identical to sequential)."""
    return project_batch(
        points[None], height, width, sensor, crop_radius, num_threads
    )[0]


def fused_available() -> bool:
    """True when the library carries the ABI-3 fused crop+augment+project."""
    lib = _load()
    return lib is not None and hasattr(lib, "elo_augment_project_batch")


def augment_project_batch_native(
    points: np.ndarray,
    T: np.ndarray,
    apply: np.ndarray,
    height: int,
    width: int,
    sensor,
    ysign: Optional[np.ndarray] = None,
    num_threads: int = 4,
) -> np.ndarray:
    """Fused mirror -> crop -> SE(3) perturbation -> projection for one
    frame of a training batch: (B, N, 3) raw clouds -> (B, H, W, 3) dense
    images in a single native streaming pass (no intermediate clouds).

    ``T`` is the (B, 4, 4) perturbation, ``apply`` a (B,) bool/uint8 mask of
    which clouds receive it (host_preprocess aug_frame semantics); ``ysign``
    an optional (B,) +1/-1 x-z reflection applied before the perturbation
    (augmentation.mirror_batch semantics); the planar crop uses
    ``sensor.max_planar_radius`` on the pre-transform coordinates, matching
    ``mirror_batch`` + ``crop_and_augment`` + ``project_batch`` exactly.
    Requires ``fused_available()``; callers fall back to the two-pass path.
    """
    import math

    lib = _load()
    if lib is None or not hasattr(lib, "elo_augment_project_batch"):
        raise RuntimeError("fused native op unavailable (need ABI >= 3)")
    points = np.ascontiguousarray(points, dtype=np.float32)
    T = np.ascontiguousarray(T, dtype=np.float32)
    apply = np.ascontiguousarray(apply, dtype=np.uint8)
    b, n = points.shape[0], points.shape[1]
    up = math.radians(sensor.vertical_fov_up_deg)
    down = math.radians(sensor.vertical_fov_down_deg)
    out = np.zeros((b, height, width, 3), dtype=np.float32)
    if ysign is None:
        ysign_p = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    else:
        ysign = np.ascontiguousarray(ysign, dtype=np.float32)
        ysign_p = ysign.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.elo_augment_project_batch(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        apply.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ysign_p,
        b, n, float(sensor.max_planar_radius),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height, width, up, down, num_threads,
    )
    return out


def _project_scan_numpy(points, height, width, up, down, crop_radius):
    """Numpy fallback mirroring elo_project_scan (lexsort formulation)."""
    az_res = 2.0 * np.pi / width
    v_res = (up - down) / max(height - 1, 1)
    v_off = -down / v_res

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r_sq = x * x + y * y + z * z
    valid = r_sq > 1e-10
    if crop_radius > 0.0:
        valid &= x * x + y * y <= np.float32(crop_radius) ** 2
    r = np.sqrt(np.where(valid, r_sq, 1.0), dtype=np.float32)

    col = ((np.float32(np.pi) - np.arctan2(y, x)) / np.float32(az_res)).astype(np.int32)
    beta = np.arcsin(np.clip(z / r, -1.0, 1.0))
    row = height - (beta / np.float32(v_res) + np.float32(v_off)).astype(np.int32)
    row = np.clip(row, 0, height - 1)
    col = np.clip(col, 0, width - 1)

    num_pix = height * width
    pix = np.where(valid, row * width + col, num_pix)
    order = np.lexsort((np.arange(len(points)), r, pix))
    pix_s = pix[order]
    first = np.ones(len(points), dtype=bool)
    first[1:] = pix_s[1:] != pix_s[:-1]
    win_pix = pix_s[first]
    win_idx = order[first]
    keep = win_pix < num_pix

    img = np.zeros((num_pix, 3), dtype=np.float32)
    img[win_pix[keep]] = points[win_idx[keep]]
    return img.reshape(height, width, 3)


def _read_scan_numpy(path: str, num_points: int) -> np.ndarray:
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:, :3]
    out = np.zeros((num_points, 3), dtype=np.float32)
    out[: min(len(pts), num_points)] = pts[:num_points]
    return out
