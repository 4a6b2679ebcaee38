"""Synthetic LiDAR scan generation for tests and benchmarks.

No reference counterpart — the reference has no test fixtures at all
(SURVEY.md §4).  Scenes are random structured point sets (ground plane +
walls + scatter) within the sensor FOV; pairs are produced by applying a
known rigid motion, so a trained or random model's pose output can be
validated against a recoverable ground truth.
"""

from __future__ import annotations

import numpy as np

from ..config import SensorConfig


def random_scene(rng: np.random.Generator, n: int, sensor: SensorConfig) -> np.ndarray:
    """(n, 3) scan covering the sensor FOV, inside the planar crop radius."""
    az = rng.uniform(-np.pi, np.pi, n)
    beta = rng.uniform(
        np.deg2rad(sensor.vertical_fov_down_deg),
        np.deg2rad(sensor.vertical_fov_up_deg),
        n,
    )
    r = rng.uniform(2.0, sensor.max_planar_radius - 2.0, n)
    pts = np.stack(
        [
            r * np.cos(beta) * np.cos(az),
            r * np.cos(beta) * np.sin(az),
            r * np.sin(beta),
        ],
        axis=-1,
    )
    return pts.astype(np.float32)


def synthetic_pair(rng: np.random.Generator, sensor: SensorConfig, motion: np.ndarray = None):
    """Returns (pc1, pc2, T_gt): pc1 = T_gt applied to pc2's scene viewed from
    the new pose — i.e. pc2 points transformed by T_gt^-1... Concretely we
    generate scene S (frame-2/world coords), set pc2 = S and
    pc1 = R^-1 (S - t) so that transforming pc1 by T_gt aligns it with pc2.
    """
    if motion is None:
        motion = np.eye(4, dtype=np.float32)
        yaw = rng.uniform(-0.02, 0.02)
        motion[:3, :3] = np.array(
            [
                [np.cos(yaw), -np.sin(yaw), 0],
                [np.sin(yaw), np.cos(yaw), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        motion[:3, 3] = [rng.uniform(0.5, 1.5), rng.uniform(-0.1, 0.1), 0.0]

    scene = random_scene(rng, sensor.num_points, sensor)
    pc2 = scene
    r, t = motion[:3, :3], motion[:3, 3]
    pc1 = (scene - t) @ r  # == R^T (S - t)
    return pc1.astype(np.float32), pc2.astype(np.float32), motion.astype(np.float32)


def synthetic_batch(rng: np.random.Generator, batch_size: int, sensor: SensorConfig, training: bool = False):
    from .augmentation import augmentation_batch

    pc1, pc2, T_gt = [], [], []
    for _ in range(batch_size):
        a, b, T = synthetic_pair(rng, sensor)
        pc1.append(a)
        pc2.append(b)
        T_gt.append(T)
    T_trans, T_trans_inv, aug_frame = augmentation_batch(rng, batch_size, training)
    return {
        "pc1": np.stack(pc1),
        "pc2": np.stack(pc2),
        "T_gt": np.stack(T_gt),
        "T_trans": T_trans,
        "T_trans_inv": T_trans_inv,
        "aug_frame": aug_frame,
    }
