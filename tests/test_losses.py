"""Golden-value tests for the multi-level pose loss against a direct numpy
transliteration of the reference formula (pwclo_model.py:437-481)."""

import numpy as np
import jax.numpy as jnp

from efficientlo_net_tpu.models.losses import LEVEL_WEIGHTS, level_loss, total_loss


def np_level_loss(q, t, q_gt, t_gt, w_x, w_q):
    q_norm = q / (np.sqrt(np.sum(q * q, -1, keepdims=True) + 1e-10) + 1e-10)
    loss_q = np.mean(np.sqrt(np.sum((q_gt - q_norm) ** 2, -1) + 1e-10))
    loss_x = np.mean(np.sqrt((t - t_gt) ** 2 + 1e-10))
    return loss_x * np.exp(-w_x) + w_x + loss_q * np.exp(-w_q) + w_q


def test_level_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((4, 4)).astype(np.float32)
    t = rng.standard_normal((4, 3)).astype(np.float32)
    q_gt = rng.standard_normal((4, 4)).astype(np.float32)
    q_gt /= np.linalg.norm(q_gt, axis=-1, keepdims=True)
    t_gt = rng.standard_normal((4, 3)).astype(np.float32)
    for w_x, w_q in [(0.0, -2.5), (1.3, 0.7)]:
        got = float(level_loss(jnp.asarray(q), jnp.asarray(t),
                               jnp.asarray(q_gt), jnp.asarray(t_gt), w_x, w_q))
        want = np_level_loss(q, t, q_gt, t_gt, w_x, w_q)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_total_loss_level_weighting():
    rng = np.random.default_rng(1)
    outputs = {
        "q": [jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
              for _ in range(4)],
        "t": [jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
              for _ in range(4)],
    }
    q_gt = jnp.asarray(np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32))
    t_gt = jnp.zeros((2, 3))
    total, metrics = total_loss(outputs, q_gt, t_gt, 0.0, -2.5)
    expected = sum(
        w * float(metrics[f"l{i}_loss"]) for i, w in enumerate(LEVEL_WEIGHTS)
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-6)
    assert LEVEL_WEIGHTS == (0.2, 0.4, 0.8, 1.6)  # coarsest weighted highest


def test_perfect_prediction_minimizes_residuals():
    q_gt = jnp.asarray(np.tile([1.0, 0, 0, 0], (2, 1)).astype(np.float32))
    t_gt = jnp.asarray(np.tile([1.0, 0.2, -0.1], (2, 1)).astype(np.float32))
    outputs = {"q": [q_gt] * 4, "t": [t_gt] * 4}
    total, _ = total_loss(outputs, q_gt, t_gt, 0.0, 0.0)
    # residual terms vanish up to the 1e-10 epsilons; only the w offsets stay
    np.testing.assert_allclose(float(total), 0.0, atol=1e-3)
