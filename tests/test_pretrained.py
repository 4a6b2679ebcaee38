"""Portable pretrained artifacts (efficientlo_net_tpu/pretrained.py):
round-trip fidelity and metadata self-description."""

import numpy as np
import jax

from efficientlo_net_tpu.config import tiny_model_config
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.pretrained import load_pretrained, save_pretrained

CFG = tiny_model_config()


def test_pretrained_round_trip(tmp_path):
    model = PWCLONet(CFG)
    h, w = CFG.sensor.height, CFG.sensor.width
    p = jax.numpy.zeros((1, h, w, 3))
    variables = model.init(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p, p, training=False,
    )
    path = str(tmp_path / "model.msgpack")
    size = save_pretrained(path, dict(variables),
                           meta={"trained_epochs": 3, "note": "test"})
    assert size > 0

    loaded, meta = load_pretrained(path)
    assert meta["trained_epochs"] == 3
    assert meta["format_version"] == 1
    assert meta["param_count"] == sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    # bitwise round trip of every leaf, and structural equality
    flat_a = jax.tree_util.tree_leaves_with_path(
        {k: variables[k] for k in ("params", "batch_stats")})
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the loaded tree drives the model identically
    out0 = model.apply(variables, p, p, training=False)
    out1 = model.apply(loaded, p, p, training=False)
    np.testing.assert_array_equal(np.asarray(out0["q"][0]),
                                  np.asarray(out1["q"][0]))


def test_pretrained_rejects_future_format(tmp_path):
    import json
    import msgpack
    import pytest

    path = str(tmp_path / "future.msgpack")
    with open(path, "wb") as f:
        f.write(msgpack.packb({"meta": json.dumps({"format_version": 99}),
                               "variables": b""}))
    with pytest.raises(ValueError, match="newer"):
        load_pretrained(path)


def test_variables_from_train_state_unwraps_model():
    from efficientlo_net_tpu.config import TrainConfig
    from efficientlo_net_tpu.pretrained import variables_from_train_state
    from efficientlo_net_tpu.training.state import create_train_state

    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TrainConfig(batch_size=2),
                               jax.random.key(0))
    v = variables_from_train_state(state)
    assert set(v) == {"params", "batch_stats"}
    assert "model" not in v["params"] and "w_q" not in v["params"]
    # drives the model directly (the stage_slam / OdometryStream surface)
    h, w = CFG.sensor.height, CFG.sensor.width
    p = jax.numpy.zeros((1, h, w, 3))
    out = model.apply(v, p, p, training=False)
    assert np.all(np.isfinite(np.asarray(out["q"][0])))


def test_trainer_load_pretrained(tmp_path):
    """Trainer.load_pretrained swaps model params/batch_stats from an
    artifact while keeping optimizer state and loss weights (the CLI
    --pretrained surface)."""
    import os
    from efficientlo_net_tpu.config import TrainConfig
    from efficientlo_net_tpu.pretrained import variables_from_train_state
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.trainer import Trainer
    from tests.test_integration import build_fake_kitti

    root, gt = build_fake_kitti(tmp_path)
    model = PWCLONet(CFG)
    donor = create_train_state(model, CFG, TrainConfig(batch_size=2),
                               jax.random.key(42))
    path = str(tmp_path / "donor.msgpack")
    save_pretrained(path, variables_from_train_state(donor),
                    meta={"trained_epochs": 9})

    trainer = Trainer(CFG, TrainConfig(batch_size=2), data_root=root,
                      log_dir=str(tmp_path / "log"), gt_dir=gt,
                      train_list=[4], val_list=[4], use_mesh=False)
    before_w_q = np.asarray(trainer.state.params["w_q"]).copy()
    meta = trainer.load_pretrained(path)
    assert meta["trained_epochs"] == 9
    # model params now match the donor bitwise; loss weights untouched
    donor_leaf = np.asarray(jax.tree_util.tree_leaves(
        jax.device_get(donor.params["model"]))[0])
    new_leaf = np.asarray(jax.tree_util.tree_leaves(
        jax.device_get(trainer.state.params["model"]))[0])
    np.testing.assert_array_equal(donor_leaf, new_leaf)
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["w_q"]), before_w_q)
