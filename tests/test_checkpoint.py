import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import TrainConfig, tiny_model_config
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.training.checkpoint import CheckpointManager
from efficientlo_net_tpu.training.state import create_train_state

CFG = tiny_model_config()
TCFG = TrainConfig(batch_size=2)


def test_save_restore_roundtrip(tmp_path):
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    state = state.replace(step=jnp.asarray(7, dtype=jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state)

    other = create_train_state(model, CFG, TCFG, jax.random.key(123))
    restored = mgr.restore(other)
    assert int(restored.step) == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_model_retention(tmp_path):
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))

    assert mgr.maybe_save_best(state, 2.0)
    assert not mgr.maybe_save_best(state, 3.0)  # worse: rejected
    state = state.replace(step=jnp.asarray(1, dtype=jnp.int32))
    assert mgr.maybe_save_best(state, 1.5)      # better: kept
    assert mgr.best_error() == 1.5
    assert not mgr.maybe_save_best(state, float("nan"))


def test_epoch_metadata_and_resume(tmp_path):
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    state = state.replace(step=jnp.asarray(42, dtype=jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    step = mgr.save(state, metrics={"val_t_rel": 1.25}, epoch=3)
    assert step == 42

    meta = mgr.metadata()
    assert meta["epoch"] == 3
    assert meta["val_t_rel"] == 1.25

    # idempotent per-step save: second call must not fail and keeps metadata
    step2 = mgr.save(state, metrics={"val_t_rel": 1.20}, epoch=3)
    assert step2 == 42
    assert mgr.metadata(42)["val_t_rel"] == 1.20


def test_best_survives_rotation_eviction(tmp_path):
    """Routine latest-N saves must never evict the best model: after
    max_to_keep newer saves, restore_best still returns the best state."""
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)

    best_state = state.replace(step=jnp.asarray(10, dtype=jnp.int32))
    assert mgr.maybe_save_best(best_state, 1.0)

    # plateau: five newer routine saves roll the rotation past the best step
    for s in (20, 30, 40, 50, 60):
        mgr.save(state.replace(step=jnp.asarray(s, dtype=jnp.int32)), epoch=s)
    assert 10 not in (mgr._mgr.all_steps() or [])  # evicted from rotation

    other = create_train_state(model, CFG, TCFG, jax.random.key(9))
    restored = mgr.restore_best(other)
    assert int(restored.step) == 10
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(best_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mark_best_points_at_saved_step(tmp_path):
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    step = mgr.save(state, epoch=0)
    mgr.mark_best(step, 0.9)
    assert mgr.best_error() == 0.9
