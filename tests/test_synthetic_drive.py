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
    assert len(valid) > 20000  # raycast ground fills near-field rings

    rad = np.linalg.norm(valid, axis=-1)
    assert rad.min() >= r.min_range - 0.1
    assert np.linalg.norm(valid[:, :2], axis=-1).max() <= r.max_radius + 0.1

    # ground truth consistency: scan points mapped back by the pose must lie
    # on the true surfaces.  Ground returns are ray-cast against the
    # closed-form terrain; structure returns are selected world points.
    pose = traj[30]
    back = valid @ pose[:3, :3].T + pose[:3, 3]
    gd = np.abs(back[:, 2] - terrain_height(back[:, 0], back[:, 1]))
    ground = gd < 0.15
    assert ground.sum() > 10000
    assert np.percentile(gd[ground], 95) < 0.05
    if (~ground).sum():
        d, _ = r.tree.query(back[~ground][:, :2], workers=-1)
        assert np.percentile(d, 95) < 0.05

    # near-field ring density: a real scan is densest close to the car (the
    # see-through point sampler used to leave near pixels empty)
    assert (rad < 10.0).sum() > 5000


def test_render_one_return_per_pixel():
    """At most one return per (row, col) cell of the sensor grid — first
    (closest) return only, like a real beam."""
    rng = np.random.default_rng(8)
    traj = synthetic_trajectory(30, rng, kind="wander", speed=0.8)
    world = build_world(traj, rng, ground_density=2.0, structures_per_m=0.3)
    r = DriveRenderer(world, noise=0.0, drop_rate=0.0)
    scan = r.render(traj[10], 150000, rng)
    v = scan[np.any(scan != 0, axis=-1)].astype(np.float64)
    rad = np.linalg.norm(v, axis=-1)
    az_res, v_res, v_off = r._grid
    beta = np.arcsin(np.clip(v[:, 2] / rad, -1, 1))
    col = ((np.pi - np.arctan2(v[:, 1], v[:, 0])) / az_res).astype(int)
    row = (r.height - (beta / v_res + v_off)).astype(int)
    pix = np.clip(row, 0, r.height - 1) * r.width + np.clip(
        col, 0, r.width - 1)
    assert len(np.unique(pix)) == len(pix)


def test_render_occlusion():
    """A wall hides everything behind it — the defining difference from the
    old see-through sampler."""
    rng = np.random.default_rng(5)
    wall = np.array(
        [[10.0, y, z] for y in np.arange(-3, 3, 0.02)
         for z in np.arange(-1.7, 3.0, 0.02)], dtype=np.float32)
    far = np.array([[20.0, 0.0, 0.5]], dtype=np.float32)
    r = DriveRenderer(np.vstack([wall, far]), noise=0.0, drop_rate=0.0)
    pose = np.eye(4)
    pose[2, 3] = 1.73
    scan = r.render(pose, 150000, rng)
    v = scan[np.any(scan != 0, axis=-1)]
    sector = v[(np.abs(np.arctan2(v[:, 1], v[:, 0])) < 0.25) & (v[:, 2] > -1.0)]
    assert len(sector) > 100
    assert sector[:, 0].max() < 10.5  # the far point never returns


def test_render_dynamics_and_dropout():
    from efficientlo_net_tpu.data.synthetic import make_dynamic_objects

    rng = np.random.default_rng(6)
    traj = synthetic_trajectory(80, rng, kind="wander", speed=0.9)
    world = build_world(traj, rng, ground_density=2.0, structures_per_m=0.2)
    dyn = make_dynamic_objects(traj, rng, 6)
    r = DriveRenderer(world, dynamics=dyn, noise=0.0, drop_rate=0.0)
    static = r.render(traj[40], 150000, np.random.default_rng(1))
    with_dyn = r.render(traj[40], 150000, np.random.default_rng(1), frame=40)
    assert not np.array_equal(static, with_dyn)

    # per-return dropout thins the scan by ~the configured rate
    r2 = DriveRenderer(world, noise=0.0, drop_rate=0.5)
    full = r.render(traj[40], 150000, np.random.default_rng(2))
    half = r2.render(traj[40], 150000, np.random.default_rng(2))
    n_full = np.any(full != 0, axis=-1).sum()
    n_half = np.any(half != 0, axis=-1).sum()
    assert 0.4 < n_half / n_full < 0.6


def test_highway_trajectory_speed_and_attitude():
    rng = np.random.default_rng(9)
    traj = synthetic_trajectory(500, rng, kind="highway", speed=2.2)
    step = np.linalg.norm(np.diff(traj[:, :3, 3], axis=0), axis=1)
    # KITTI seq-01 regime: sustained 1.5-2.8 m/frame
    assert step.min() > 1.0 and step.max() < 3.2
    assert 1.8 < step.mean() < 2.6
    # platform attitude: pitch/roll present (terrain coupling + suspension
    # noise) but small; yaw-only would read exactly zero
    pitch = -np.arcsin(np.clip(traj[:, 2, 0], -1, 1))
    roll = np.arctan2(traj[:, 2, 1], traj[:, 2, 2])
    assert 0.05 < np.degrees(pitch.std()) < 2.0
    assert 0.05 < np.degrees(roll.std()) < 2.0


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
