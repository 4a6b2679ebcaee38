import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientlo_net_tpu.config import tiny_model_config
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.models.preprocess import preprocess
from efficientlo_net_tpu.models.losses import total_loss
from efficientlo_net_tpu.ops.projection import project_to_range_image
from efficientlo_net_tpu.ops import quaternion as Q

CFG = tiny_model_config()


def synthetic_scan(rng, n, radius=30.0):
    """Synthetic LiDAR scan covering the full azimuth/elevation FOV,
    within the 35 m crop."""
    az = rng.uniform(-np.pi, np.pi, n)
    beta = rng.uniform(np.deg2rad(-24.8), np.deg2rad(2.0), n)
    r = rng.uniform(2.0, radius, n)
    pts = np.stack(
        [
            r * np.cos(beta) * np.cos(az),
            r * np.cos(beta) * np.sin(az),
            r * np.sin(beta),
        ],
        axis=-1,
    )
    return pts.astype(np.float32)


def make_batch(rng, b=2):
    n = CFG.sensor.num_points
    pc1 = np.stack([synthetic_scan(rng, n) for _ in range(b)])
    pc2 = np.stack([synthetic_scan(rng, n) for _ in range(b)])
    T_gt = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    return pc1, pc2, T_gt


def jit_init(model):
    """Jitted model.init — one cached compile instead of thousands of eager
    CPU dispatches (the suite is eager-dispatch-dominated otherwise; the
    persistent compile cache shares the program across tests and runs)."""
    return jax.jit(model.init, static_argnames=("training",))


def jit_eval_apply(model):
    return jax.jit(lambda v, a, b: model.apply(v, a, b, training=False))


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.default_rng(0)
    pc1, pc2, _ = make_batch(rng)
    h, w = CFG.sensor.height, CFG.sensor.width
    p1, _ = project_to_range_image(jnp.asarray(pc1), None, h, w, CFG.sensor)
    p2, _ = project_to_range_image(jnp.asarray(pc2), None, h, w, CFG.sensor)
    model = PWCLONet(CFG)
    variables = jit_init(model)(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1, p2, training=False,
    )
    return model, variables, p1, p2


def test_forward_shapes(model_and_vars):
    model, variables, p1, p2 = model_and_vars
    out = jit_eval_apply(model)(variables, p1, p2)
    assert len(out["q"]) == 4 and len(out["t"]) == 4
    for q, t in zip(out["q"], out["t"]):
        assert q.shape == (2, 4)
        assert t.shape == (2, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-3
        )
        assert np.all(np.isfinite(np.asarray(q)))
        assert np.all(np.isfinite(np.asarray(t)))


def test_train_mode_mutates_batch_stats(model_and_vars):
    model, variables, p1, p2 = model_and_vars
    out, updates = jax.jit(
        lambda v, a, b: model.apply(
            v, a, b, training=True, bn_momentum=0.9, stochastic=True,
            rngs={"neighbor": jax.random.key(3), "dropout": jax.random.key(4)},
            mutable=["batch_stats"],
        )
    )(variables, p1, p2)
    assert "batch_stats" in updates
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    moved = any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(old, new)
    )
    assert moved


def test_loss_and_grads_finite(model_and_vars):
    model, variables, p1, p2 = model_and_vars
    rng = np.random.default_rng(1)
    q_gt = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    t_gt = jnp.zeros((2, 3))

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p1, p2, training=True, bn_momentum=0.9, stochastic=False,
            rngs={"dropout": jax.random.key(5)},
            mutable=["batch_stats"],
        )
        loss, _ = total_loss(out, q_gt, t_gt, 0.0, -2.5)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # at least some gradients non-zero
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_preprocess_gt_math():
    rng = np.random.default_rng(2)
    b, n = 2, 64
    pc1 = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
    pc2 = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
    T_gt = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T_gt[:, :3, 3] = [0.5, 0.1, 0.0]
    T_tr = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T_tr[:, :3, 3] = [0.1, 0.0, 0.0]
    T_tr_inv = np.linalg.inv(T_tr).astype(np.float32)
    aug = np.array([1, 2])

    p1, p2, q_gt, t_gt = preprocess(
        jnp.asarray(pc1), jnp.asarray(pc2), jnp.asarray(T_gt),
        jnp.asarray(T_tr), jnp.asarray(T_tr_inv), jnp.asarray(aug)
    )
    # sample 0: aug frame 1 -> T_gt' = T_gt @ T_tr_inv
    expected0 = T_gt[0] @ T_tr_inv[0]
    np.testing.assert_allclose(np.asarray(t_gt)[0], expected0[:3, 3], atol=1e-5)
    # sample 1: aug frame 2 -> T_gt' = T_tr @ T_gt
    expected1 = T_tr[1] @ T_gt[1]
    np.testing.assert_allclose(np.asarray(t_gt)[1], expected1[:3, 3], atol=1e-5)
    # identity rotation -> unit quaternion
    np.testing.assert_allclose(np.asarray(q_gt)[0], [1, 0, 0, 0], atol=1e-5)


def test_preprocess_crop_and_validity():
    pc = np.zeros((1, 4, 3), dtype=np.float32)
    pc[0, 0] = [10.0, 0, 0]     # valid
    pc[0, 1] = [40.0, 0, 0]     # beyond 35 m planar -> cropped
    pc[0, 2] = [0, 0, 0]        # padding
    pc[0, 3] = [0, 0, 5.0]      # planar radius 0, valid
    eye = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1))
    p1, _, _, _ = preprocess(
        jnp.asarray(pc), jnp.asarray(pc), jnp.asarray(eye),
        jnp.asarray(eye), jnp.asarray(eye), jnp.asarray(np.array([1]))
    )
    p1 = np.asarray(p1)[0]
    np.testing.assert_allclose(p1[0], [10, 0, 0])
    np.testing.assert_allclose(p1[1], [0, 0, 0])
    np.testing.assert_allclose(p1[2], [0, 0, 0])
    np.testing.assert_allclose(p1[3], [0, 0, 5.0])


def test_merged_eval_tower_matches_separate_pyramids(model_and_vars):
    """Eval-mode __call__ runs ONE 2B-batch Siamese tower (halving the
    launch-bound neighbor-select dispatches, docs/perf_breakdown.json);
    EMA-BN makes it bit-identical to two separate towers."""
    model, variables, p1, p2 = model_and_vars
    merged = jit_eval_apply(model)(variables, p1, p2)
    pyr1 = jax.jit(
        lambda v, p: model.apply(v, p, False, 0.99, False,
                                 method=model._pyramid)
    )(variables, p1)
    pyr2 = jax.jit(
        lambda v, p: model.apply(v, p, False, 0.99, False,
                                 method=model._pyramid)
    )(variables, p2)
    sep = jax.jit(
        lambda v, a, b: model.apply(v, a, b, training=False,
                                    method=model.forward_from_pyramids)
    )(variables, pyr1, pyr2)
    np.testing.assert_array_equal(np.asarray(merged["q"][0]),
                                  np.asarray(sep["q"][0]))
    np.testing.assert_array_equal(np.asarray(merged["t"][0]),
                                  np.asarray(sep["t"][0]))
