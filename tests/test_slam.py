import numpy as np
import jax.numpy as jnp
import pytest

from efficientlo_net_tpu.backend import pose_graph as pg
from efficientlo_net_tpu.backend.slam import SlamConfig, SlidingWindowSLAM
from efficientlo_net_tpu.ops import quaternion as Q
from efficientlo_net_tpu.ops import se3


def drive_square(slam, side=20.0, step=0.5, noise=0.0, rng=None):
    """Drive a square loop: 4 sides with 90-degree turns; returns GT poses."""
    gt = [np.eye(4)]
    yaw_step = np.pi / 2
    for leg in range(4):
        for _ in range(int(side / step)):
            rel = np.eye(4)
            rel[0, 3] = step
            if noise and rng is not None:
                xi = rng.standard_normal(6) * noise
                rel = rel @ np.asarray(se3.se3_exp(jnp.asarray(xi.astype(np.float32))))
            gt.append(gt[-1] @ rel)
            q = Q.mat_to_quat(jnp.asarray(rel[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), rel[:3, 3])
        # turn in place
        rel = np.eye(4)
        rel[:3, :3] = np.array(
            [[np.cos(yaw_step), -np.sin(yaw_step), 0],
             [np.sin(yaw_step), np.cos(yaw_step), 0],
             [0, 0, 1]]
        )
        gt.append(gt[-1] @ rel)
        q = Q.mat_to_quat(jnp.asarray(rel[:3, :3].astype(np.float32)))
        slam.add_frame(np.asarray(q), rel[:3, 3])
    return np.stack(gt)


def test_keyframe_promotion_and_trajectory():
    slam = SlidingWindowSLAM(SlamConfig(keyframe_distance=2.0, optimize_every=1000))
    gt = drive_square(slam)
    # keyframes every ~2 m over an 80 m loop -> tens of keyframes
    assert 20 < len(slam.kf_poses) < 80
    # noise-free odometry: full trajectory matches GT
    traj = np.stack(slam.full_trajectory)
    assert traj.shape[0] == gt.shape[0]
    np.testing.assert_allclose(traj[-1], gt[-1], atol=1e-6)


def test_window_optimization_runs_and_is_consistent():
    rng = np.random.default_rng(0)
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=2.0, window_size=10, optimize_every=3)
    )
    drive_square(slam, noise=0.002, rng=rng)
    chi2 = slam.optimize_window()
    assert np.isfinite(chi2)
    # poses must remain rigid transforms
    for p in slam.kf_poses:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_loop_closure_improves_endpoint():
    rng = np.random.default_rng(1)
    # systematic drift: tiny yaw bias per step
    cfg = SlamConfig(keyframe_distance=2.0, window_size=200, optimize_every=10**9)
    slam = SlidingWindowSLAM(cfg)

    bias = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0, 0, 0, 0, 0, 0.002], dtype=np.float32))))
    gt = [np.eye(4)]
    for leg in range(4):
        for _ in range(40):
            rel = np.eye(4)
            rel[0, 3] = 0.5
            gt.append(gt[-1] @ rel)
            noisy = rel @ bias
            q = Q.mat_to_quat(jnp.asarray(noisy[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), noisy[:3, 3])
        rot = np.eye(4)
        rot[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        gt.append(gt[-1] @ rot)
        q = Q.mat_to_quat(jnp.asarray(rot[:3, :3].astype(np.float32)))
        slam.add_frame(np.asarray(q), rot[:3, 3])
    gt = np.stack(gt)

    drift_before = np.linalg.norm(slam.kf_poses[-1][:3, 3] - gt[-1][:3, 3])

    # loop closure: first and last keyframes coincide-ish in GT (square loop)
    # measured relative transform = identity-ish from GT
    z = np.linalg.inv(gt[0]) @ gt[-1]
    slam.add_loop_closure(0, len(slam.kf_poses) - 1, z, weight=100.0)
    slam.optimize_window()

    drift_after = np.linalg.norm(slam.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_after < drift_before * 0.5


def test_window_limits_graph_size():
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=1.0, window_size=5, optimize_every=2)
    )
    drive_square(slam, side=30.0)
    # optimization touched only windows of <= 5 nodes; full keyframe list grows
    assert len(slam.kf_poses) > 5
    ids = slam._window_ids()
    assert len(ids) == 5
