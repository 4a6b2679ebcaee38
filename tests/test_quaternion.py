import numpy as np
import jax.numpy as jnp

from efficientlo_net_tpu.ops import quaternion as Q


def random_quat(rng, shape=()):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qmul_matches_matrix_composition():
    rng = np.random.default_rng(0)
    qa, qb = random_quat(rng, (5,)), random_quat(rng, (5,))
    q_ab = np.asarray(Q.qmul(jnp.asarray(qa), jnp.asarray(qb)))
    r_ab = np.asarray(Q.quat_to_mat(jnp.asarray(q_ab)))
    ra = np.asarray(Q.quat_to_mat(jnp.asarray(qa)))
    rb = np.asarray(Q.quat_to_mat(jnp.asarray(qb)))
    np.testing.assert_allclose(r_ab, ra @ rb, atol=1e-5)


def test_qinv_roundtrip():
    rng = np.random.default_rng(1)
    q = random_quat(rng, (7,)) * 1.7  # non-unit allowed
    ident = np.asarray(Q.qmul(jnp.asarray(q), Q.qinv(jnp.asarray(q))))
    expected = np.tile(np.array([1.0, 0, 0, 0]), (7, 1))
    np.testing.assert_allclose(ident, expected, atol=1e-4)


def test_qrotate_matches_matrix():
    rng = np.random.default_rng(2)
    q = random_quat(rng, (3,))
    pts = rng.standard_normal((3, 10, 3))
    rot_q = np.asarray(Q.qrotate(jnp.asarray(q), jnp.asarray(pts)))
    r = np.asarray(Q.quat_to_mat(jnp.asarray(q)))
    rot_m = np.einsum("bij,bnj->bni", r, pts)
    np.testing.assert_allclose(rot_q, rot_m, atol=1e-5)


def test_mat_to_quat_roundtrip():
    rng = np.random.default_rng(3)
    q = random_quat(rng, (20,))
    # fix sign convention: euler path returns w >= 0 hemisphere sometimes
    m = np.asarray(Q.quat_to_mat(jnp.asarray(q)))
    q2 = np.asarray(Q.mat_to_quat(jnp.asarray(m)))
    m2 = np.asarray(Q.quat_to_mat(jnp.asarray(q2)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


def test_compose_pose_matches_matrices():
    rng = np.random.default_rng(4)
    qd, qc = random_quat(rng, (4,)), random_quat(rng, (4,))
    td = rng.standard_normal((4, 3))
    tc = rng.standard_normal((4, 3))
    q_new, t_new = Q.compose_pose(
        jnp.asarray(qd), jnp.asarray(td), jnp.asarray(qc), jnp.asarray(tc)
    )
    t_d4 = np.asarray(Q.quat_trans_to_mat4(jnp.asarray(qd), jnp.asarray(td)))
    t_c4 = np.asarray(Q.quat_trans_to_mat4(jnp.asarray(qc), jnp.asarray(tc)))
    combined = t_d4 @ t_c4
    t_new4 = np.asarray(Q.quat_trans_to_mat4(jnp.asarray(q_new), jnp.asarray(t_new)))
    np.testing.assert_allclose(t_new4, combined, atol=1e-5)


def test_transform_points():
    rng = np.random.default_rng(5)
    q = random_quat(rng, (2,))
    t = rng.standard_normal((2, 3))
    pts = rng.standard_normal((2, 6, 3))
    mat = Q.quat_trans_to_mat4(jnp.asarray(q), jnp.asarray(t))
    out = np.asarray(Q.transform_points(mat, jnp.asarray(pts)))
    expected = np.einsum("bij,bnj->bni", np.asarray(mat)[:, :3, :3], pts) + t[:, None]
    np.testing.assert_allclose(out, expected, atol=1e-5)
