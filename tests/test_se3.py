import numpy as np
import jax.numpy as jnp

from efficientlo_net_tpu.ops import se3


def random_twists(rng, n, scale=1.0):
    return (rng.standard_normal((n, 6)) * scale).astype(np.float32)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    xi = random_twists(rng, 20, scale=0.8)
    m = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(m))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_exp_log_small_angles():
    rng = np.random.default_rng(1)
    xi = random_twists(rng, 10, scale=1e-6)
    m = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(m))
    np.testing.assert_allclose(xi2, xi, atol=1e-8)


def test_exp_is_rigid():
    rng = np.random.default_rng(2)
    xi = random_twists(rng, 5)
    m = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    for mm in m:
        r = mm[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
        np.testing.assert_allclose(mm[3], [0, 0, 0, 1], atol=0)


def test_inverse():
    rng = np.random.default_rng(3)
    xi = random_twists(rng, 5)
    m = se3.se3_exp(jnp.asarray(xi))
    ident = np.asarray(m @ se3.se3_inv(m))
    np.testing.assert_allclose(ident, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)


def test_exp_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(4)
    xi = random_twists(rng, 5, scale=0.5).astype(np.float64)
    for x in xi:
        gen = np.zeros((4, 4))
        gen[:3, :3] = np.asarray(se3.hat(jnp.asarray(x[3:])))
        gen[:3, 3] = x[:3]
        expected = expm(gen)
        got = np.asarray(se3.se3_exp(jnp.asarray(x.astype(np.float32))))
        np.testing.assert_allclose(got, expected, atol=1e-5)
