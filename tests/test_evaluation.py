import numpy as np
import pytest

from efficientlo_net_tpu.evaluation import kitti_metrics as KM
from efficientlo_net_tpu.evaluation.odometry import (
    integrate_sequence,
    quat_to_mat_np,
)


def make_straight_trajectory(n, step=1.0):
    """Poses moving along +z (camera forward) at `step` m/frame."""
    poses = []
    for i in range(n):
        p = np.eye(4)
        p[2, 3] = i * step
        poses.append(p)
    return poses


def test_integration_identity_rotation():
    n = 10
    q = np.tile([1.0, 0, 0, 0], (n, 1))
    t = np.tile([1.0, 0, 0], (n, 1))
    rows = integrate_sequence(q, t)
    # pose i = translation (i+1) along x (first row already contains pair 0)
    for i in range(n):
        np.testing.assert_allclose(rows[i].reshape(3, 4)[:, 3], [i + 1, 0, 0], atol=1e-9)


def test_integration_with_calibration():
    # Tr maps lidar->camera; with yaw motion the conjugation must transfer it
    tr = np.eye(4)
    tr[:3, :3] = KM.R_C2L[:3, :3]
    yaw = 0.1
    q = np.array([[np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]])  # lidar z-rotation
    t = np.array([[1.0, 0.0, 0.0]])
    rows = integrate_sequence(q, t, tr)
    pose = np.eye(4)
    pose[:3, :] = rows[0].reshape(3, 4)
    tt = np.eye(4)
    tt[:3, :3] = quat_to_mat_np(q[0])
    tt[:3, 3] = t[0]
    expected = tr @ tt @ np.linalg.inv(tr)
    np.testing.assert_allclose(pose, expected, atol=1e-9)


def test_rpe_perfect_trajectory_zero_error():
    gt = make_straight_trajectory(3000, step=0.5)  # 1.5 km
    res = KM.evaluate_sequence(gt, gt, seq="00")
    assert res.errors, "should produce segment errors"
    assert res.t_rel == pytest.approx(0.0, abs=1e-9)
    assert res.r_rel == pytest.approx(0.0, abs=1e-9)


def test_rpe_known_scale_error():
    # prediction travels 1% farther -> t_rel should be ~1%
    gt = make_straight_trajectory(3000, step=0.5)
    pred = make_straight_trajectory(3000, step=0.505)
    res = KM.evaluate_sequence(gt, pred, seq="01")
    assert res.t_rel == pytest.approx(1.0, rel=0.05)
    assert res.r_rel == pytest.approx(0.0, abs=1e-6)


def test_rpe_known_rotation_error():
    # constant yaw drift of 0.001 rad/frame at 0.5 m/frame
    # -> 0.002 rad/m -> r_rel = 0.002 * 180/pi * 100 deg/100m
    n = 3000
    gt = make_straight_trajectory(n, step=0.5)
    pred = []
    pose = np.eye(4)
    dyaw = 0.001
    rot = np.array(
        [
            [np.cos(dyaw), -np.sin(dyaw), 0, 0],
            [np.sin(dyaw), np.cos(dyaw), 0, 0],
            [0, 0, 1, 0.5],
            [0, 0, 0, 1],
        ]
    )
    for i in range(n):
        pred.append(pose.copy())
        pose = pose @ rot
    res = KM.evaluate_sequence(gt, pred, seq="02")
    expected_r_rel = 0.002 * 180 / np.pi * 100
    assert res.r_rel == pytest.approx(expected_r_rel, rel=0.1)


def test_segment_and_speed_tables():
    gt = make_straight_trajectory(3000, step=0.5)
    pred = make_straight_trajectory(3000, step=0.505)
    errs = KM.sequence_errors(gt, pred)
    seg = KM.segment_error_table(errs)
    assert seg[100] is not None
    assert seg[100][0] == pytest.approx(0.01, rel=0.05)
    spd = KM.speed_error_table(errs)
    assert any(v is not None for v in spd.values())


def test_load_poses_with_and_without_idx(tmp_path):
    rows = np.hstack([np.arange(3)[:, None], np.tile(np.eye(4)[:3].reshape(-1), (3, 1))])
    p13 = tmp_path / "p13.txt"
    np.savetxt(p13, rows)
    poses = KM.load_poses(str(p13))
    assert len(poses) == 3
    np.testing.assert_allclose(poses[0], np.eye(4))

    p12 = tmp_path / "p12.txt"
    np.savetxt(p12, rows[:, 1:])
    poses = KM.load_poses(str(p12))
    assert len(poses) == 3


def test_to_camera_coord_roundtrip():
    rng = np.random.default_rng(0)
    p = np.eye(4)
    p[:3, 3] = rng.standard_normal(3)
    back = KM.to_camera_coord(p)
    # pure translation in lidar coords (x fwd, y left, z up) maps to camera
    # coords (z fwd, x right, y down)
    np.testing.assert_allclose(
        back[:3, 3], [-p[1, 3], -p[2, 3], p[0, 3]], atol=1e-12
    )


def test_save_sequence_errors_roundtrip(tmp_path):
    """Per-segment txt dump parity with reference saveSequenceErrors
    (kitti_evaluation.py:178-187): rows of first_frame r/len t/len len speed."""
    import numpy as np

    from efficientlo_net_tpu.evaluation.kitti_metrics import (
        SegmentError,
        save_sequence_errors,
    )

    errs = [
        SegmentError(first_frame=0, r_err=1e-4, t_err=0.01, length=100.0, speed=8.0),
        SegmentError(first_frame=10, r_err=2e-4, t_err=0.02, length=200.0, speed=12.5),
    ]
    path = tmp_path / "00_errors.txt"
    save_sequence_errors(errs, str(path))
    rows = np.loadtxt(path)
    assert rows.shape == (2, 5)
    np.testing.assert_allclose(rows[1], [10, 2e-4, 0.02, 200.0, 12.5])


def test_ate_zero_for_identical_and_rigidly_moved():
    rng = np.random.default_rng(0)
    # a wiggly 3D trajectory
    pts = np.cumsum(rng.normal(0, 0.5, (100, 3)), axis=0)
    poses = []
    for p in pts:
        m = np.eye(4)
        m[:3, 3] = p
        poses.append(m)
    assert KM.absolute_trajectory_error(poses, poses, align=False) == 0.0

    # a rigid transform of the whole trajectory is gauge, not error
    th = 0.7
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]]
    )
    moved = []
    for m in poses:
        mm = m.copy()
        mm[:3, 3] = rot @ m[:3, 3] + np.array([5.0, -2.0, 1.0])
        moved.append(mm)
    assert KM.absolute_trajectory_error(poses, moved, align=True) < 1e-9
    assert KM.absolute_trajectory_error(poses, moved, align=False) > 1.0


def test_ate_known_offset():
    poses, off = [], []
    for i in range(50):
        m = np.eye(4)
        m[0, 3] = float(i)
        poses.append(m)
        mo = m.copy()
        mo[1, 3] = 2.0  # constant 2 m lateral offset
        off.append(mo)
    assert KM.absolute_trajectory_error(poses, off, align=False) == pytest.approx(2.0)


def test_standalone_evaluate_cli(tmp_path, capsys):
    """Parity with invoking the reference evaluator as a program
    (kitti_evaluation.py:623-632): score existing trajectory files."""
    from efficientlo_net_tpu.evaluation.evaluate_cli import main

    gt = make_straight_trajectory(3000, step=0.5)
    pred = make_straight_trajectory(3000, step=0.505)  # 1% scale error
    res_dir = tmp_path / "result"
    gt_dir = tmp_path / "gt"
    res_dir.mkdir(); gt_dir.mkdir()
    np.savetxt(gt_dir / "07.txt", np.stack([p[:3].reshape(-1) for p in gt]))
    np.savetxt(res_dir / "07_pred.txt",
               np.stack([p[:3].reshape(-1) for p in pred]))

    rc = main(["--result_dir", str(res_dir), "--gt_dir", str(gt_dir),
               "--eva_seqs", "07_pred"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "seq07 Average_t_error" in out
    t_rel = float(out.split("Average_t_error")[1].split()[0])
    assert abs(t_rel - 1.0) < 0.1  # the planted 1% scale error
    assert (res_dir / "07_errors.txt").exists()
