import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.backend import pose_graph as PG
from efficientlo_net_tpu.ops import se3


def make_chain(rng, n, drift=0.05):
    """GT poses along a curve + noisy odometry measurements."""
    gt = [np.eye(4, dtype=np.float32)]
    for i in range(1, n):
        xi = np.array([1.0, 0, 0, 0, 0, 0.1]) + rng.standard_normal(6) * 0.01
        gt.append(np.asarray(gt[-1] @ np.asarray(se3.se3_exp(jnp.asarray(xi.astype(np.float32))))))
    gt = np.stack(gt)

    src, dst, meas = [], [], []
    for i in range(n - 1):
        z = np.linalg.inv(gt[i]) @ gt[i + 1]
        noise = np.asarray(se3.se3_exp(jnp.asarray(
            (rng.standard_normal(6) * drift).astype(np.float32))))
        src.append(i)
        dst.append(i + 1)
        meas.append(z @ noise)
    return gt, np.array(src), np.array(dst), np.stack(meas)


def integrate(meas, n):
    poses = [np.eye(4, dtype=np.float32)]
    for z in meas:
        poses.append(poses[-1] @ z)
    return np.stack(poses)[:n]


def pose_rmse(a, b):
    return float(np.sqrt(np.mean((a[:, :3, 3] - b[:, :3, 3]) ** 2)))


def test_loop_closure_reduces_drift():
    rng = np.random.default_rng(0)
    n = 30
    gt, src, dst, meas = make_chain(rng, n, drift=0.03)

    # loop closure: exact measurement between node 0 and the last node
    z_loop = np.linalg.inv(gt[0]) @ gt[-1]
    src = np.concatenate([src, [0]])
    dst = np.concatenate([dst, [n - 1]])
    meas = np.concatenate([meas, z_loop[None]])
    weight = np.ones(len(src), dtype=np.float32)
    weight[-1] = 100.0  # trust the loop closure

    init = integrate(meas[: n - 1], n)
    factors = PG.make_factors(src, dst, meas, weight, num_nodes=n)
    opt, history = PG.optimize(
        jnp.asarray(init), factors, PG.GaussNewtonConfig(iterations=15)
    )
    opt = np.asarray(opt)

    assert pose_rmse(opt, gt) < pose_rmse(init, gt) * 0.7
    # loop closure endpoints should now nearly satisfy the constraint
    r = np.asarray(PG.factor_residual(
        jnp.asarray(opt[0]), jnp.asarray(opt[-1]), jnp.asarray(z_loop)
    ))
    assert np.linalg.norm(r) < 0.05
    # chi2 must be non-increasing overall
    h = np.asarray(history)
    assert h[-1] <= h[1]


def test_perfect_measurements_zero_residual():
    rng = np.random.default_rng(1)
    n = 10
    gt, src, dst, meas = make_chain(rng, n, drift=0.0)
    factors = PG.make_factors(src, dst, meas, num_nodes=n)
    opt, history = PG.optimize(
        jnp.asarray(gt.astype(np.float32)), factors,
        PG.GaussNewtonConfig(iterations=3),
    )
    _, _, chi2 = PG.assemble_system(opt, factors)
    assert float(chi2) < 1e-6


def test_padded_factors_are_ignored():
    rng = np.random.default_rng(2)
    n = 8
    gt, src, dst, meas = make_chain(rng, n, drift=0.02)
    f1 = PG.make_factors(src, dst, meas, num_nodes=n)
    f2 = PG.make_factors(src, dst, meas, num_nodes=n, capacity=32)
    init = integrate(meas, n).astype(np.float32)
    o1, _ = PG.optimize(jnp.asarray(init), f1, PG.GaussNewtonConfig(iterations=5))
    o2, _ = PG.optimize(jnp.asarray(init), f2, PG.GaussNewtonConfig(iterations=5))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-4)


def test_distributed_reduction_matches_single_device():
    from efficientlo_net_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    n = 16
    gt, src, dst, meas = make_chain(rng, n, drift=0.02)
    # pad to a multiple of 8 devices
    factors = PG.make_factors(src, dst, meas, num_nodes=n, capacity=16)
    init = jnp.asarray(integrate(meas, n).astype(np.float32))

    h1, b1, c1 = PG.assemble_system(init, factors)

    mesh = make_mesh()
    reduce_fn = PG._make_distributed_reduce(mesh, n)
    h2, b2, c2 = reduce_fn(init, factors)

    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-4)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-5)

    # full optimization over the mesh agrees with single-device
    o1, _ = PG.optimize(init, factors, PG.GaussNewtonConfig(iterations=5))
    o2, _ = PG.optimize(init, factors, PG.GaussNewtonConfig(iterations=5), mesh=mesh)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-3)


def test_gm_rejects_false_closure():
    """A grossly wrong loop-closure factor must not corrupt the solution
    under the redescending Geman-McClure kernel — and must visibly corrupt
    it when robustification is off (otherwise the test proves nothing)."""
    rng = np.random.default_rng(5)
    n = 30
    gt, src, dst, meas = make_chain(rng, n, drift=0.01)

    # false closure: claims node 0 and node n-1 coincide (they are far apart)
    z_false = np.eye(4, dtype=np.float32)
    src = np.concatenate([src, [0]])
    dst = np.concatenate([dst, [n - 1]])
    meas = np.concatenate([meas, z_false[None]])
    weight = np.ones(len(src), dtype=np.float32)
    weight[-1] = 100.0

    init = integrate(meas[: n - 1], n)
    factors = PG.make_factors(src, dst, meas, weight, num_nodes=n)

    naive, _ = PG.optimize(
        jnp.asarray(init), factors, PG.GaussNewtonConfig(iterations=15)
    )
    robust, _ = PG.optimize(
        jnp.asarray(init), factors,
        PG.GaussNewtonConfig(
            iterations=15, robust_delta=1.0, robust_kernel="gm"
        ),
    )
    err_naive = pose_rmse(np.asarray(naive), gt)
    err_robust = pose_rmse(np.asarray(robust), gt)
    err_init = pose_rmse(init, gt)

    assert err_naive > 3.0          # the false closure wrecks the naive solve
    assert err_robust < err_naive * 0.2
    assert err_robust < err_init + 0.1  # no worse than raw odometry


def test_huber_inactive_within_band():
    """With all residuals inside the Huber band the robust solve must match
    the plain one exactly (weight scale saturates at 1)."""
    rng = np.random.default_rng(6)
    n = 12
    gt, src, dst, meas = make_chain(rng, n, drift=0.01)
    factors = PG.make_factors(src, dst, meas, num_nodes=n)
    init = jnp.asarray(integrate(meas, n).astype(np.float32))
    o1, _ = PG.optimize(init, factors, PG.GaussNewtonConfig(iterations=5))
    o2, _ = PG.optimize(
        init, factors, PG.GaussNewtonConfig(iterations=5, robust_delta=10.0)
    )
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_marginalization_preserves_information():
    """Schur-eliminating a node must give the same solution for the kept
    nodes as solving the full system and reading off the kept block."""
    rng = np.random.default_rng(4)
    n = 6
    gt, src, dst, meas = make_chain(rng, n, drift=0.05)
    factors = PG.make_factors(src, dst, meas, num_nodes=n)
    init = jnp.asarray(integrate(meas, n).astype(np.float32))

    h, b, _ = PG.assemble_system(init, factors)
    # gauge: fix node 0 heavily, light damping like the solver
    dim = 6 * n
    prior = jnp.zeros((dim,)).at[:6].set(1e6)
    h = h + jnp.diag(prior) + 1e-6 * jnp.eye(dim)

    full_delta = np.asarray(jnp.linalg.solve(h, -b))

    keep = np.arange(1, n)
    drop = np.array([0])
    h_red, b_red = PG.marginalize(h, b, keep, drop)
    red_delta = np.asarray(jnp.linalg.solve(h_red, -b_red))

    keep_ids = (keep[:, None] * 6 + np.arange(6)[None, :]).reshape(-1)
    np.testing.assert_allclose(red_delta, full_delta[keep_ids], atol=1e-3)
