"""End-to-end integration: fake KITTI tree -> dataset -> loader -> trainer
steps -> sequence prediction -> trajectory -> RPE metrics."""

import os

import numpy as np
import jax
import pytest

from efficientlo_net_tpu.config import TrainConfig, tiny_model_config
from efficientlo_net_tpu.data.kitti import SEQ_LENGTH_TABLE, OdometryDataset
from efficientlo_net_tpu.data.synthetic import random_scene
from efficientlo_net_tpu.evaluation.runner import (
    evaluate_sequences,
    mean_t_rel,
    sequence_indices,
)
from efficientlo_net_tpu.training.trainer import Trainer, train_indices_for

CFG = tiny_model_config()
SEQ = 4  # shortest KITTI sequence: 271 frames
N_FRAMES = SEQ_LENGTH_TABLE[SEQ + 1] - SEQ_LENGTH_TABLE[SEQ]


def build_fake_kitti(base_dir):
    """Build a miniature but structurally faithful KITTI tree for seq 04.
    ``base_dir`` is a pathlib dir; returns (dataset_root, gt_dir) strings."""
    root = base_dir / "dataset"
    seq_dir = root / "04"
    (seq_dir / "velodyne").mkdir(parents=True)
    gt_dir = root.parent / "ground_truth_pose"
    (gt_dir / "kitti_T_diff").mkdir(parents=True)

    # calibration: camera = R_C2L^-1 * lidar
    tr = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], dtype=np.float64
    )
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("P0: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(f"{v:.12e}" for v in tr.reshape(-1)) + "\n")

    rng = np.random.default_rng(0)
    scene = random_scene(rng, 4096, CFG.sensor).astype(np.float32)

    # vehicle moves 0.5 m forward (lidar +x) per frame; scans are the static
    # scene observed from each pose
    step = 0.5
    cam_poses = []
    tr4 = np.eye(4)
    tr4[:3, :] = tr
    for i in range(N_FRAMES):
        world_T_lidar = np.eye(4)
        world_T_lidar[0, 3] = i * step
        pts = (scene - world_T_lidar[:3, 3]) @ world_T_lidar[:3, :3]
        pad = np.zeros((CFG.sensor.num_points, 4), dtype=np.float32)
        m = min(len(pts), CFG.sensor.num_points)
        pad[:m, :3] = pts[:m]
        pad.tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        cam_poses.append(tr4 @ world_T_lidar @ np.linalg.inv(tr4))

    # GT files: camera-frame absolute poses + per-pair relative transforms
    rows = np.stack([p[:3, :].reshape(-1) for p in cam_poses])
    np.savetxt(gt_dir / "04.txt", rows)
    # T_diff[i] = P_{i-1}^-1 P_i (camera-frame relative pose); then
    # T_gt = Tr^-1 T_diff Tr maps frame-i lidar points onto frame i-1
    diffs = [np.eye(4)]
    for i in range(1, N_FRAMES):
        diffs.append(np.linalg.inv(cam_poses[i - 1]) @ cam_poses[i])
    diffs = np.stack([d[:3, :].reshape(-1) for d in diffs])
    np.save(gt_dir / "kitti_T_diff" / "04_diff.npy", diffs)
    return str(root), str(gt_dir)


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    return build_fake_kitti(tmp_path_factory.mktemp("kitti"))


def test_dataset_geometry(fake_kitti):
    root, gt_dir = fake_kitti
    ds = OdometryDataset(root, num_points=CFG.sensor.num_points, gt_pose_dir=gt_dir)
    idx = SEQ_LENGTH_TABLE[SEQ] + 5
    pc_t, pc_tm1, t_gt = ds[idx]
    assert pc_t.shape == (CFG.sensor.num_points, 3)
    # T_gt must map frame-t points onto frame t-1 points (same static scene)
    valid = np.any(pc_t != 0, axis=-1)
    moved = pc_t[valid] @ t_gt[:3, :3].T + t_gt[:3, 3]
    # compare against the t-1 scan: same scene order, same validity
    np.testing.assert_allclose(moved, pc_tm1[valid], atol=1e-4)


def test_dataset_first_pair_is_self(fake_kitti):
    root, gt_dir = fake_kitti
    ds = OdometryDataset(root, num_points=CFG.sensor.num_points, gt_pose_dir=gt_dir)
    pc_t, pc_tm1, t_gt = ds[SEQ_LENGTH_TABLE[SEQ]]
    np.testing.assert_array_equal(pc_t, pc_tm1)


def test_t_diff_derived_from_devkit_poses(fake_kitti, tmp_path):
    """A stock KITTI download has only XX.txt (devkit absolute poses), not
    the reference repo's precomputed kitti_T_diff arrays; the dataset must
    derive identical per-pair relatives on the fly."""
    import shutil

    from efficientlo_net_tpu.data.kitti import t_diff_from_poses

    root, gt_dir = fake_kitti
    precomputed = np.load(os.path.join(gt_dir, "kitti_T_diff", "04_diff.npy"))
    derived = t_diff_from_poses(os.path.join(gt_dir, "04.txt"))
    np.testing.assert_allclose(derived, precomputed, atol=1e-9)

    # dataset-level: gt dir without kitti_T_diff yields the same T_gt
    bare_gt = tmp_path / "ground_truth_pose"
    bare_gt.mkdir()
    shutil.copy(os.path.join(gt_dir, "04.txt"), bare_gt / "04.txt")
    ds_pre = OdometryDataset(root, num_points=CFG.sensor.num_points, gt_pose_dir=gt_dir)
    ds_bare = OdometryDataset(
        root, num_points=CFG.sensor.num_points, gt_pose_dir=str(bare_gt)
    )
    idx = SEQ_LENGTH_TABLE[SEQ] + 7
    np.testing.assert_allclose(ds_bare[idx][2], ds_pre[idx][2], atol=1e-6)


def test_train_steps_and_eval_pipeline(fake_kitti, tmp_path):
    root, gt_dir = fake_kitti
    tcfg = TrainConfig(batch_size=2)
    trainer = Trainer(
        CFG, tcfg, data_root=root, log_dir=str(tmp_path / "log"),
        gt_dir=gt_dir, train_list=[SEQ], val_list=[SEQ], use_mesh=False,
    )
    trainer.train_one_epoch(0, limit_batches=3)
    assert int(jax.device_get(trainer.state.step)) == 3

    results = evaluate_sequences(
        trainer.eval_step,
        jax.device_get(trainer.state.params),
        jax.device_get(trainer.state.batch_stats),
        trainer.dataset,
        [SEQ],
        gt_dir=gt_dir,
        result_dir=str(tmp_path / "result"),
        batch_size=2,
    )
    assert SEQ in results
    assert np.isfinite(results[SEQ].t_rel)
    assert os.path.exists(tmp_path / "result" / "04_pred.txt")
    assert np.isfinite(mean_t_rel(results))


def test_train_indices_for():
    idxs = train_indices_for([0, 4])
    assert len(idxs) == SEQ_LENGTH_TABLE[1] + N_FRAMES
    assert idxs[0] == 0
    assert idxs[-1] == SEQ_LENGTH_TABLE[5] - 1


def test_warm_start_restore_from_other_run(fake_kitti, tmp_path):
    """CLI --checkpoint_path semantics: restoring another run's checkpoint
    dir must carry both the state and the epoch metadata (resume at the
    right epoch, not epoch 0)."""
    root, gt_dir = fake_kitti
    t1 = Trainer(CFG, TrainConfig(batch_size=2), data_root=root,
                 log_dir=str(tmp_path / "run1"), gt_dir=gt_dir,
                 train_list=[SEQ], val_list=[SEQ], use_mesh=False)
    t1.ckpt.save(t1.state, epoch=3)

    t2 = Trainer(CFG, TrainConfig(batch_size=2), data_root=root,
                 log_dir=str(tmp_path / "run2"), gt_dir=gt_dir,
                 train_list=[SEQ], val_list=[SEQ], use_mesh=False)
    t2.restore(path=str(tmp_path / "run1" / "checkpoints"))
    assert t2.start_epoch == 4
    np.testing.assert_array_equal(
        np.asarray(t2.state.step), np.asarray(t1.state.step)
    )
