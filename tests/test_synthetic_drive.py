"""Synthetic drive generation: trajectories, worlds, scan rendering.

These feed tools/synthetic_drive.py (full-pipeline demonstration without the
real KITTI dataset); no jax needed.
"""

import numpy as np
import pytest

from efficientlo_net_tpu.data.synthetic import (
    DriveRenderer,
    build_world,
    synthetic_trajectory,
    terrain_height,
)


def test_loop_trajectory_closes():
    rng = np.random.default_rng(0)
    traj = synthetic_trajectory(400, rng, kind="loop", speed=0.6)
    assert traj.shape == (400, 4, 4)
    gap = np.linalg.norm(traj[-1][:2, 3] - traj[0][:2, 3])
    assert gap < 2 * 0.6  # returns to the start within one step

    # rigid rotations throughout
    for p in traj[::50]:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-9)


def test_loop_trajectory_too_short_raises():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        synthetic_trajectory(10, rng, kind="loop", speed=0.5)


def test_wander_trajectory_covers_turns():
    rng = np.random.default_rng(1)
    traj = synthetic_trajectory(300, rng, kind="wander", speed=0.9)
    yaws = np.unwrap(np.arctan2(traj[:, 1, 0], traj[:, 0, 0]))
    # the deliberate-turn injection must produce real heading changes
    assert np.ptp(yaws) > np.pi / 4
    # ... but driving is predominantly straight (eval drives are), so the
    # generator must not leave a residual always-turning prior
    rate = np.abs(np.diff(yaws))
    assert (rate < np.deg2rad(0.3)).mean() > 0.5


def test_loop_radius_parameter():
    rng = np.random.default_rng(4)
    traj = synthetic_trajectory(600, rng, kind="loop", speed=0.9, radius=11.0)
    yaws = np.unwrap(np.arctan2(traj[:, 1, 0], traj[:, 0, 0]))
    rate = np.abs(np.diff(yaws))
    # corner turn rate is speed/radius
    np.testing.assert_allclose(rate.max(), 0.9 / 11.0, rtol=0.05)


def test_sensor_follows_terrain():
    rng = np.random.default_rng(2)
    traj = synthetic_trajectory(50, rng, kind="wander")
    for p in traj[::10]:
        x, y = p[0, 3], p[1, 3]
        assert abs(p[2, 3] - (terrain_height(x, y) + 1.73)) < 1e-9


def test_render_scan_geometry():
    rng = np.random.default_rng(3)
    traj = synthetic_trajectory(60, rng, kind="wander", speed=1.0)
    world = build_world(traj, rng, ground_density=2.0, structures_per_m=0.2)
    r = DriveRenderer(world, noise=0.01)

    scan = r.render(traj[30], 150000, rng)
    assert scan.shape == (150000, 3) and scan.dtype == np.float32
    valid = scan[np.any(scan != 0, axis=-1)]
    assert len(valid) > 1000

    rad = np.linalg.norm(valid, axis=-1)
    assert rad.min() >= r.min_range - 0.1
    assert np.linalg.norm(valid[:, :2], axis=-1).max() <= r.max_radius + 0.1

    # ground truth consistency: scan points mapped back by the pose must lie
    # on world points (within the injected sensor noise)
    pose = traj[30]
    back = valid @ pose[:3, :3].T + pose[:3, 3]
    d, _ = r.tree.query(back[:, :2], workers=-1)
    assert np.percentile(d, 95) < 0.05

    # two consecutive renders observe the same static world: their point
    # sets, expressed in world coords, overlap
    scan2 = r.render(traj[31], 150000, rng)
    valid2 = scan2[np.any(scan2 != 0, axis=-1)]
    back2 = valid2 @ traj[31][:3, :3].T + traj[31][:3, 3]
    from scipy.spatial import cKDTree

    d12, _ = cKDTree(back).query(back2[: 2000], workers=-1)
    assert np.median(d12) < 0.1


def test_merge_report_history_and_stale_keys(tmp_path, monkeypatch):
    """ADVICE r2: the report merge must (a) archive — not delete —
    learning-curve points from other train splits, (b) drop odometry rows a
    fresh eval did not produce, (c) record the actual trained epoch count
    and preserve it across stages that don't re-evaluate."""
    import argparse
    import json
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import synthetic_drive as sd

    monkeypatch.setattr(sd, "REPO", str(tmp_path))
    os.makedirs(tmp_path / "docs")
    path = tmp_path / "docs" / "synthetic_drive.json"
    path.write_text(json.dumps({
        "history": [
            {"epochs": 12, "train_seqs": [3, 4], "odometry": 99.0},
            {"epochs": 12, "train_seqs": sd.TRAIN_SEQS, "odometry": 64.4},
        ],
        "odometry_holdout": {"t_rel": 73.9, "r_rel": 53.5, "ate_m": 310.3},
    }))
    args = argparse.Namespace(epochs=300, batch=8, lr_decay_step=50000,
                              lr_decay_rate=0.7, bn_decay_step=50000)

    sd._merge_report(
        args, {"odometry": {"t_rel": 5.0, "r_rel": 4.0, "ate_m": 1.0}},
        trained_epochs=30,
    )
    data = json.loads(path.read_text())
    # same-split point kept, new point appended; foreign-split point archived
    assert [h["epochs"] for h in data["history"]] == [12, 30]
    assert all(h["train_seqs"] == sd.TRAIN_SEQS for h in data["history"])
    assert data["history_archived"] == [
        {"epochs": 12, "train_seqs": [3, 4], "odometry": 99.0}
    ]
    # the fresh eval had no holdout row -> stale row dropped
    assert "odometry_holdout" not in data
    assert data["config"]["trained_epochs"] == 30
    assert data["config"]["requested_epochs"] == 300

    # a later slam-only merge must not lose the trained-epochs provenance
    sd._merge_report(args, {"slam_refined": {"t_rel": 1.0, "r_rel": 1.0,
                                             "ate_m": 0.5}})
    data = json.loads(path.read_text())
    assert data["config"]["trained_epochs"] == 30
    assert data["slam_refined"]["ate_m"] == 0.5
    md = (tmp_path / "docs" / "synthetic_drive.md").read_text()
    assert "30 epochs" in md
