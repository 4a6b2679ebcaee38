"""Host-projected training path (data/host_preprocess.py + the
host_projected train step): the numpy crop/augment twin must match the
device ``preprocess`` exactly, the host projector must match the exact
device projection, and the projected step must be the same optimization as
the device step when fed identical images."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import TrainConfig, tiny_model_config
from efficientlo_net_tpu.data.host_preprocess import (
    augment_project_batch,
    crop_and_augment,
)
from efficientlo_net_tpu.data.synthetic import synthetic_batch
from efficientlo_net_tpu.models.preprocess import gt_quat, preprocess
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.ops.projection import project_to_range_image
from efficientlo_net_tpu.training.state import create_train_state
from efficientlo_net_tpu.training.step import (
    _forward_inputs,
    make_train_step,
)

CFG = tiny_model_config()
TCFG = TrainConfig(batch_size=2)


def _raw_batch(seed=0, b=2):
    rng = np.random.default_rng(seed)
    batch = synthetic_batch(rng, b, CFG.sensor, training=True)
    # exercise the crop: push some points beyond the planar radius and
    # keep some padding zeros
    batch["pc1"][:, :7, :2] *= 50.0
    batch["pc1"][:, 7:12] = 0.0
    batch["pc2"][:, 3:9] = 0.0
    return batch


def test_crop_and_augment_matches_device_preprocess():
    batch = _raw_batch()
    pc1_h, pc2_h = crop_and_augment(
        batch["pc1"], batch["pc2"], batch["T_trans"], batch["aug_frame"],
        max_planar_radius=CFG.sensor.max_planar_radius,
    )
    pc1_d, pc2_d, q_gt_d, t_gt_d = preprocess(
        jnp.asarray(batch["pc1"]), jnp.asarray(batch["pc2"]),
        jnp.asarray(batch["T_gt"]), jnp.asarray(batch["T_trans"]),
        jnp.asarray(batch["T_trans_inv"]), jnp.asarray(batch["aug_frame"]),
        max_planar_radius=CFG.sensor.max_planar_radius,
    )
    np.testing.assert_allclose(pc1_h, np.asarray(pc1_d), atol=1e-5)
    np.testing.assert_allclose(pc2_h, np.asarray(pc2_d), atol=1e-5)
    # zeroed points stay exactly zero (validity semantics downstream)
    assert not np.any(pc1_h[:, 7:12])
    assert not np.any(pc2_h[:, 3:9])

    q_gt, t_gt = gt_quat(
        jnp.asarray(batch["T_gt"]), jnp.asarray(batch["T_trans"]),
        jnp.asarray(batch["T_trans_inv"]), jnp.asarray(batch["aug_frame"]),
    )
    np.testing.assert_allclose(np.asarray(q_gt), np.asarray(q_gt_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_gt), np.asarray(t_gt_d), atol=1e-6)


def test_host_projection_matches_exact_device_projection():
    """Host images == device images from the exact ("sort") method on the
    same augmented clouds (the native projector implements those semantics;
    libm pixel-edge ulp cases are allowed to differ on <0.1% of pixels)."""
    batch = _raw_batch(seed=1)
    out = augment_project_batch(batch, CFG.sensor)
    assert set(out) == {"p1", "p2", "T_gt", "T_trans", "T_trans_inv",
                        "aug_frame"}
    h, w = CFG.sensor.height, CFG.sensor.width
    assert out["p1"].shape == (2, h, w, 3)

    pc1_h, pc2_h = crop_and_augment(
        batch["pc1"], batch["pc2"], batch["T_trans"], batch["aug_frame"],
        max_planar_radius=CFG.sensor.max_planar_radius,
    )
    for host_img, pts in ((out["p1"], pc1_h), (out["p2"], pc2_h)):
        dev_img, _ = project_to_range_image(
            jnp.asarray(pts), None, h, w, CFG.sensor, method="sort"
        )
        mismatch = np.any(host_img != np.asarray(dev_img), axis=-1)
        assert mismatch.mean() < 1e-3, f"{mismatch.sum()} pixels differ"


def test_projected_step_matches_device_step_on_same_images():
    """Feed the projected step the images the device path itself computes:
    the two steps must produce identical losses and parameters."""
    model = PWCLONet(CFG)
    step_dev = jax.jit(make_train_step(model, CFG, TCFG))
    step_proj = jax.jit(make_train_step(model, CFG, TCFG, host_projected=True))

    batch = {k: jnp.asarray(v) for k, v in _raw_batch(seed=2).items()}
    p1, p2, _, _ = _forward_inputs(batch, CFG.sensor)
    proj_batch = {
        "p1": p1, "p2": p2, "T_gt": batch["T_gt"],
        "T_trans": batch["T_trans"], "T_trans_inv": batch["T_trans_inv"],
        "aug_frame": batch["aug_frame"],
    }

    s0 = create_train_state(model, CFG, TCFG, jax.random.key(0))
    s1 = create_train_state(model, CFG, TCFG, jax.random.key(0))
    rng = jax.random.key(7)
    s0, m0 = step_dev(s0, batch, rng)
    s1, m1 = step_proj(s1, proj_batch, rng)

    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s0.params, s1.params,
    )


def test_host_projected_training_learns():
    """End-to-end: loader-style host-projected batches actually train."""
    model = PWCLONet(CFG)
    step = jax.jit(make_train_step(model, CFG, TCFG, host_projected=True))
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))

    batch = augment_project_batch(_raw_batch(seed=3), CFG.sensor)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_quantized_projected_transfer_matches_float():
    """int16 image transfer (1.25 mm LSB) must track the float loss to
    within the quantization noise floor."""
    from efficientlo_net_tpu.data.loader import quantize_points

    model = PWCLONet(CFG)
    step = jax.jit(make_train_step(model, CFG, TCFG, host_projected=True))
    batch = augment_project_batch(_raw_batch(seed=4), CFG.sensor)

    f32 = {k: jnp.asarray(v) for k, v in batch.items()}
    i16 = dict(f32, p1=jnp.asarray(quantize_points(batch["p1"])),
               p2=jnp.asarray(quantize_points(batch["p2"])))
    rng = jax.random.key(5)
    s0 = create_train_state(model, CFG, TCFG, jax.random.key(0))
    s1 = create_train_state(model, CFG, TCFG, jax.random.key(0))
    _, m0 = step(s0, f32, rng)
    _, m1 = step(s1, i16, rng)
    np.testing.assert_allclose(
        float(m0["loss"]), float(m1["loss"]), rtol=0.02, atol=0.05
    )


def test_loader_emits_projected_batches():
    from efficientlo_net_tpu.data.loader import PrefetchLoader

    class _FakeDataset:
        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            b = synthetic_batch(rng, 1, CFG.sensor, training=True)
            return b["pc1"][0], b["pc2"][0], b["T_gt"][0]

    loader = PrefetchLoader(
        _FakeDataset(), np.arange(4), batch_size=2, training=True,
        num_workers=2, host_projection_sensor=CFG.sensor,
    )
    h, w = CFG.sensor.height, CFG.sensor.width
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["p1"].shape == (2, h, w, 3)
        assert b["p2"].dtype == np.float32
        assert "pc1" not in b


def test_fused_native_matches_two_pass_pipeline():
    """The ABI-3 fused crop+augment+project (native/lidar_io.cpp
    elo_augment_project_batch) must reproduce the two-pass pipeline
    (crop_and_augment -> project_batch) on both frames, including samples
    where the perturbation lands on frame 2 (aug_frame == 2)."""
    from efficientlo_net_tpu.data import native_io

    if not native_io.fused_available():
        import pytest

        pytest.skip("native library without the fused op")

    batch = _raw_batch(seed=3, b=4)
    # force both aug_frame branches to be exercised
    batch["aug_frame"] = np.array([1, 2, 1, 2], dtype=batch["aug_frame"].dtype)
    s = CFG.sensor
    pc1, pc2 = crop_and_augment(
        batch["pc1"], batch["pc2"], batch["T_trans"], batch["aug_frame"],
        max_planar_radius=s.max_planar_radius,
    )
    from efficientlo_net_tpu.data.native_io import (
        augment_project_batch_native, project_batch)

    r1 = project_batch(pc1, s.height, s.width, s)
    r2 = project_batch(pc2, s.height, s.width, s)
    aug = np.asarray(batch["aug_frame"])
    f1 = augment_project_batch_native(
        batch["pc1"], batch["T_trans"], aug == 1, s.height, s.width, s)
    f2 = augment_project_batch_native(
        batch["pc2"], batch["T_trans"], aug != 1, s.height, s.width, s)
    # bit-identical on this host; allow a pixel-edge ulp allowance in case
    # another compiler contracts the transform's mul/adds differently
    for ref, fused in ((r1, f1), (r2, f2)):
        mismatch = np.any(ref != fused, axis=-1)
        assert mismatch.mean() < 1e-3, f"{mismatch.sum()} pixels differ"


def test_deferred_mirror_matches_cloud_mirror():
    """mirror_batch(clouds=False) + the fused native ysign must produce the
    same projected images as mirroring the clouds in numpy first (the
    host-projected loader path vs the device-path sample stream)."""
    from efficientlo_net_tpu.data.augmentation import mirror_batch
    from efficientlo_net_tpu.data import native_io

    batch = _raw_batch(seed=4, b=4)
    batch["aug_frame"] = np.array([1, 2, 2, 1], dtype=batch["aug_frame"].dtype)

    mirrored = mirror_batch(dict(batch), np.random.default_rng(11))
    deferred = mirror_batch(dict(batch), np.random.default_rng(11),
                            clouds=False)
    np.testing.assert_array_equal(mirrored["T_gt"], deferred["T_gt"])
    assert "mirror_sign" in deferred and (deferred["mirror_sign"] < 0).any()

    ref = augment_project_batch(mirrored, CFG.sensor)
    out = augment_project_batch(deferred, CFG.sensor)
    for k in ("p1", "p2"):
        mismatch = np.any(ref[k] != out[k], axis=-1)
        assert mismatch.mean() < 1e-3, f"{k}: {mismatch.sum()} pixels differ"
    assert "mirror_sign" not in out

    if native_io.fused_available():
        # the numpy fallback honors mirror_sign the same way
        import unittest.mock as mock

        with mock.patch.object(native_io, "fused_available",
                               return_value=False):
            fb = augment_project_batch(deferred, CFG.sensor)
        for k in ("p1", "p2"):
            mismatch = np.any(ref[k] != fb[k], axis=-1)
            assert mismatch.mean() < 1e-3, f"fallback {k} differs"
