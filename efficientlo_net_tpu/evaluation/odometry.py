"""Trajectory integration from per-pair relative poses.

Parity with the eval path of reference ``main.py:459-583``: quaternion ->
rotation matrix, conjugate back into the camera frame with the per-sequence
calibration (``TT = Tr @ T @ Tr^-1``, main.py:557-558), left-multiply
accumulate (``T_final = T_final @ TT``, main.py:569), and emit KITTI
12-value rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    """Non-unit-safe quaternion to rotation matrix (reference main.py:401-434)."""
    w, x, y, z = q
    nq = w * w + x * x + y * y + z * z
    if nq < 1e-8:
        return np.eye(3)
    s = 2.0 / nq
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    return np.array(
        [
            [1.0 - (yY + zZ), xY - wZ, xZ + wY],
            [xY + wZ, 1.0 - (xX + zZ), yZ - wX],
            [xZ - wY, yZ + wX, 1.0 - (xX + yY)],
        ]
    )


def integrate_sequence(
    quats: np.ndarray,
    trans: np.ndarray,
    tr: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Accumulate per-pair (q, t) LiDAR-frame poses into absolute camera-frame
    poses.

    Args:
      quats: (N, 4) predicted quaternions, frame i relative to i-1.
      trans: (N, 3) predicted translations.
      tr:    (4, 4) LiDAR->camera calibration ``Tr`` (identity if None).

    Returns: (N, 12) KITTI-format rows (3x4 row-major), first row = pose of
    frame 0 (the reference seeds the chain with the first pair's relative
    transform, main.py:561-566).
    """
    n = quats.shape[0]
    if tr is None:
        tr = np.eye(4)
    tr_inv = np.linalg.inv(tr)

    out = np.zeros((n, 12))
    t_final = np.eye(4)
    for i in range(n):
        tt = np.eye(4)
        tt[:3, :3] = quat_to_mat_np(np.asarray(quats[i], dtype=np.float64))
        tt[:3, 3] = trans[i]
        tt = tr @ tt @ tr_inv
        t_final = t_final @ tt
        out[i] = t_final[:3, :].reshape(12)
    return out


def save_kitti_trajectory(path: str, poses_12: np.ndarray) -> None:
    np.savetxt(path, poses_12, fmt="%.08f")


def load_kitti_trajectory(path: str) -> np.ndarray:
    return np.loadtxt(path).reshape(-1, 12)
