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


# ---------------------------------------------------------------------------
# Synthetic drive: a persistent world sampled along a smooth trajectory.
#
# No reference counterpart (the reference assumes the real KITTI dataset).
# These functions produce structurally faithful KITTI-style sequences —
# static world, per-frame scans rendered from exact SE(3) poses — so the
# whole stack (training, sequence evaluation, RPE metrics, SLAM refinement)
# can run end-to-end at full resolution without the real data.  Scans are
# views of ONE persistent scene, so consecutive frames genuinely overlap the
# way real LiDAR pairs do (unlike ``synthetic_pair``, which re-observes the
# identical point set).

SENSOR_HEIGHT_M = 1.73  # HDL-64 mount height above ground on the KITTI car


def terrain_height(x, y):
    """Gentle large-wavelength ground undulation (meters)."""
    return 0.5 * np.sin(0.015 * x) + 0.4 * np.cos(0.021 * y + 0.7)


def _pose_from_xy_yaw(x, y, yaw):
    p = np.eye(4, dtype=np.float64)
    c, s = np.cos(yaw), np.sin(yaw)
    p[:3, :3] = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    p[:3, 3] = [x, y, terrain_height(x, y) + SENSOR_HEIGHT_M]
    return p


def synthetic_trajectory(
    n_frames: int, rng: np.random.Generator, kind: str = "wander",
    speed: float = 0.8, radius: float = 8.0,
) -> np.ndarray:
    """(n_frames, 4, 4) world_T_lidar poses (yaw-only attitude, terrain z).

    ``kind``:
      * "wander" — segment-based driving: mostly-straight cruises
        interleaved with deliberate constant-rate turns whose sharpness
        (0.5°..6°/frame) and cruise speed (0.45x..1.45x nominal) sweep the
        ranges an evaluation drive can hit.  Real driving — and KITTI — is
        predominantly straight, so a generator that turns all the time
        trains a turn prior the eval drive never exhibits;
      * "loop"  — a rounded rectangle (corner ``radius``) that closes on
        itself (loop-closure opportunities for the SLAM backend, like real
        KITTI seq 07).
    """
    if kind == "loop":
        r = radius
        length = n_frames * speed
        straight = (length - 2.0 * np.pi * r) / 4.0
        if straight <= 0:
            raise ValueError("loop trajectory needs n_frames*speed > 2*pi*r")
        # piecewise arc-length parameterization of the rounded rectangle
        legs = []
        for _ in range(4):
            legs.append(("s", straight))
            legs.append(("t", np.pi * r / 2.0))
        poses, x, y, yaw = [], 0.0, 0.0, 0.0
        s_total, li, s_in_leg = 0.0, 0, 0.0
        for _ in range(n_frames):
            poses.append(_pose_from_xy_yaw(x, y, yaw))
            ds = speed
            while ds > 0 and li < len(legs):
                kind_l, leg_len = legs[li]
                take = min(ds, leg_len - s_in_leg)
                if kind_l == "s":
                    x += take * np.cos(yaw)
                    y += take * np.sin(yaw)
                else:
                    dyaw = take / r
                    # integrate along the arc (left turn)
                    cx = x - r * np.sin(yaw)
                    cy = y + r * np.cos(yaw)
                    yaw += dyaw
                    x = cx + r * np.sin(yaw)
                    y = cy - r * np.cos(yaw)
                s_in_leg += take
                ds -= take
                if s_in_leg >= leg_len - 1e-9:
                    li += 1
                    s_in_leg = 0.0
        return np.stack(poses)

    # "wander": straight cruises interleaved with deliberate turns
    yaw_rate = np.zeros(n_frames)
    speeds = np.full(n_frames, speed)
    i = 0
    while i < n_frames:
        straight = int(rng.integers(40, 140))
        speeds[i:i + straight] = rng.uniform(0.45, 1.45) * speed
        i += straight
        if i >= n_frames:
            break
        dur = int(rng.integers(15, 65))
        angle = rng.choice([-1.0, 1.0]) * rng.uniform(np.pi / 5, np.pi / 2)
        yaw_rate[i:i + dur] = angle / dur
        speeds[i:i + dur] = rng.uniform(0.45, 1.2) * speed
        i += dur
    # small heading/throttle texture so straights are not perfectly rigid
    yaw_rate += 0.0015 * rng.standard_normal(n_frames)
    speeds = np.clip(speeds + 0.03 * rng.standard_normal(n_frames), 0.2, 1.5)

    poses, x, y, yaw = [], 0.0, 0.0, 0.0
    for i in range(n_frames):
        poses.append(_pose_from_xy_yaw(x, y, yaw))
        yaw += yaw_rate[i]
        x += speeds[i] * np.cos(yaw)
        y += speeds[i] * np.sin(yaw)
    return np.stack(poses)


def build_world(
    traj: np.ndarray,
    rng: np.random.Generator,
    ground_density: float = 24.0,
    corridor: float = 38.0,
    structures_per_m: float = 0.6,
) -> np.ndarray:
    """(M, 3) world points in a corridor around the trajectory.

    Ground plane (terrain-following) plus box-shaped structures (building
    faces, poles) on both sides of the path.  Density is chosen so a 35 m
    scan sees ~100k points, matching a real HDL-64 frame's order of
    magnitude.
    """
    from scipy.spatial import cKDTree

    traj_xy = traj[:, :2, 3]
    tree = cKDTree(traj_xy[::5])
    lo = traj_xy.min(axis=0) - corridor
    hi = traj_xy.max(axis=0) + corridor
    area = float(np.prod(hi - lo))

    cand = rng.uniform(lo, hi, (int(area * ground_density), 2))
    d, _ = tree.query(cand, workers=-1)
    gxy = cand[d <= corridor]
    gz = terrain_height(gxy[:, 0], gxy[:, 1]) + rng.normal(0, 0.02, len(gxy))
    parts = [np.column_stack([gxy, gz])]

    path_len = float(np.sum(np.linalg.norm(np.diff(traj_xy, axis=0), axis=1)))
    n_struct = max(4, int(path_len * structures_per_m))
    centers = rng.uniform(lo, hi, (n_struct * 4, 2))
    d, _ = tree.query(centers, workers=-1)
    centers = centers[(d > 4.0) & (d <= corridor - 2.0)][:n_struct]
    for cx, cy in centers:
        w, dep = rng.uniform(0.4, 4.0, 2)
        h = rng.uniform(0.8, 5.0)
        yaw = rng.uniform(0, np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        base = terrain_height(cx, cy)
        # points on the four vertical faces, ~24 pts/m^2
        n_face = max(8, int(2.0 * (w + dep) * h * 24))
        u = rng.uniform(-0.5, 0.5, n_face)
        v = rng.uniform(0.0, 1.0, n_face)
        side = rng.integers(0, 4, n_face)
        fx = np.where(side < 2, u * w, np.where(side == 2, -0.5, 0.5) * w)
        fy = np.where(side < 2, np.where(side == 0, -0.5, 0.5) * dep, u * dep)
        px = cx + c * fx - s * fy
        py = cy + s * fx + c * fy
        parts.append(np.column_stack([px, py, base + v * h]))
    world = np.concatenate(parts).astype(np.float32)
    return world


class DriveRenderer:
    """Renders per-frame scans of a world from SE(3) poses."""

    def __init__(self, world: np.ndarray, max_radius: float = 35.5,
                 min_range: float = 2.2, noise: float = 0.01):
        from scipy.spatial import cKDTree

        self.world = world
        self.tree = cKDTree(world[:, :2])
        self.max_radius = max_radius
        self.min_range = min_range
        self.noise = noise

    def render(self, pose: np.ndarray, num_points: int,
               rng: np.random.Generator) -> np.ndarray:
        """(num_points, 3) float32 scan in the lidar frame (zero-padded)."""
        idx = self.tree.query_ball_point(pose[:2, 3], self.max_radius)
        pts = self.world[idx].astype(np.float64)
        local = (pts - pose[:3, 3]) @ pose[:3, :3]
        r = np.linalg.norm(local, axis=-1)
        local = local[r >= self.min_range]
        local = local + rng.normal(0, self.noise, local.shape)
        if len(local) > num_points:
            sel = rng.choice(len(local), num_points, replace=False)
            local = local[sel]
        else:
            rng.shuffle(local)
        out = np.zeros((num_points, 3), dtype=np.float32)
        out[: len(local)] = local
        return out


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
