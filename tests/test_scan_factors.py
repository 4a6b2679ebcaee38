"""Point-to-plane scan factors: normals, projective association, GN pose
recovery, and the shard_map map-block reduction (VERDICT r1 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from efficientlo_net_tpu.backend import pose_graph as pg
from efficientlo_net_tpu.backend import scan_factors as sfm
from efficientlo_net_tpu.config import SensorConfig
from efficientlo_net_tpu.ops import se3
from efficientlo_net_tpu.ops.projection import project_to_range_image

SENSOR = SensorConfig(height=16, width=256, num_points=8192)


def boxy_scene(rng, n=8192):
    """Points on a few axis-aligned planes around the origin (walls+floor)."""
    pts = []
    m = n // 4
    # floor z = -1.5
    xy = rng.uniform(-8, 8, size=(m, 2))
    pts.append(np.column_stack([xy, np.full(m, -1.5)]))
    # wall x = 6
    yz = np.column_stack([rng.uniform(-8, 8, m), rng.uniform(-1.2, 1.2, m)])
    pts.append(np.column_stack([np.full(m, 6.0), yz]))
    # wall y = -5
    xz = np.column_stack([rng.uniform(-8, 8, m), rng.uniform(-1.2, 1.2, m)])
    pts.append(np.column_stack([xz[:, 0], np.full(m, -5.0), xz[:, 1]]))
    # wall y = 7
    pts.append(np.column_stack([xz[:, 0], np.full(m, 7.0), xz[:, 1]]))
    return np.concatenate(pts).astype(np.float32)


def project(points):
    img, _ = project_to_range_image(
        jnp.asarray(points[None]), None, SENSOR.height, SENSOR.width, SENSOR
    )
    return img[0]


def test_normals_on_a_plane():
    rng = np.random.default_rng(0)
    m = 2048
    xy = rng.uniform(-8, 8, size=(m, 2)).astype(np.float32)
    pts = np.column_stack([xy, np.full(m, -1.5, dtype=np.float32)])
    img = project(pts)
    normals, ok = sfm.compute_normals(img)
    ok = np.asarray(ok)
    n = np.asarray(normals)[ok]
    assert ok.sum() > 50
    # floor plane: normal is +/- z; orientation points toward the sensor (+z)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=5e-2)
    assert np.all(n[:, 2] > 0)


def test_association_identity():
    rng = np.random.default_rng(1)
    scene = boxy_scene(rng)
    img = project(scene)
    normals, _ = sfm.compute_normals(img)
    corr = sfm.projective_association(
        img, img, normals, jnp.eye(4), SENSOR, max_dist=0.5
    )
    w = np.asarray(corr.w)
    assert w.sum() > 100
    # with identity transform each point matches itself: r == 0
    r = np.einsum(
        "pc,pc->p", np.asarray(corr.n_i), np.asarray(corr.p_j - corr.q_i)
    )
    assert np.max(np.abs(r * w)) < 1e-5


def test_point_to_plane_recovers_pose():
    """Classic ICP test: observe the boxy scene from two poses, start the
    second pose off by a perturbation, GN with scan factors must recover it."""
    rng = np.random.default_rng(2)
    scene = boxy_scene(rng)

    true_rel = np.eye(4, dtype=np.float32)
    true_rel[:3, 3] = [0.4, -0.25, 0.08]
    ang = 0.04
    true_rel[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    # frame i at origin; frame j at true_rel (world_T_j); scans of the static
    # scene from each pose
    scan_i = scene
    inv = np.linalg.inv(true_rel)
    scan_j = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    img_i, img_j = project(scan_i), project(scan_j)

    # initial guess: identity relative pose (0.4m + 2.3deg off); two outer
    # iterations re-associate correspondences at the refined pose (standard
    # projective-ICP practice)
    opt = jnp.asarray(np.stack([np.eye(4), np.eye(4)]).astype(np.float32))
    factors = pg.make_factors([0], [1], np.eye(4)[None], [1e-6], num_nodes=2)
    for outer in range(2):
        corr = sfm.correspondences_for_pair(
            img_i, img_j, opt[0], opt[1], SENSOR, max_dist=1.0
        )
        assert float(jnp.sum(corr.w)) > 100
        sf = sfm.make_scan_factors([(0, 1)], [corr])
        opt, hist = pg.optimize(
            opt, factors, pg.GaussNewtonConfig(iterations=6), scan_factors=sf
        )
    rel = np.asarray(se3.se3_inv(opt[0]) @ opt[1])
    err_t = np.linalg.norm(rel[:3, 3] - true_rel[:3, 3])
    err_r = np.linalg.norm(
        np.asarray(se3.so3_log(jnp.asarray(rel[:3, :3] @ true_rel[:3, :3].T)))
    )
    assert err_t < 0.05, (err_t, rel[:3, 3], true_rel[:3, 3])
    assert err_r < 0.01, err_r
    assert np.asarray(hist)[-1] < np.asarray(hist)[0]


def test_distributed_scan_reduce_matches_single_device():
    """Map-block partitioning: point blocks sharded over an 8-device mesh,
    psum-assembled — must equal the single-device reduction exactly."""
    rng = np.random.default_rng(3)
    scene = boxy_scene(rng)
    img = project(scene)
    corr = sfm.correspondences_for_pair(
        img, img, jnp.eye(4), jnp.eye(4), SENSOR
    )
    sf = sfm.make_scan_factors([(0, 1)], [corr])
    poses = jnp.asarray(np.stack([np.eye(4), np.eye(4)]).astype(np.float32))
    # perturb pose 1 so residuals are non-zero
    xi = jnp.asarray(np.array([0.1, -0.05, 0.02, 0.01, 0.0, 0.03], np.float32))
    poses = poses.at[1].set(poses[1] @ se3.se3_exp(xi))

    h1, b1, c1 = sfm.accumulate_scan_factors(poses, sf)

    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    reduce_fn = sfm.make_distributed_scan_reduce(mesh)
    h8, b8, c8 = reduce_fn(poses, sf)

    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b8), np.asarray(b1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(float(c8), float(c1), rtol=2e-5)


def test_slam_scan_factors_reduce_drift():
    """Sliding-window SLAM with range-image payloads: point-to-plane factors
    between consecutive keyframes must pull a noisy odometry chain toward the
    true trajectory."""
    from efficientlo_net_tpu.backend.slam import SlamConfig, SlidingWindowSLAM
    from efficientlo_net_tpu.ops import quaternion as Q

    rng = np.random.default_rng(7)
    scene = boxy_scene(rng)

    # 0.5 m steps keep the whole trajectory inside the boxy scene (a drive
    # onto a wall plane degenerates the scan geometry)
    n_frames = 8
    step = np.eye(4, dtype=np.float32)
    step[0, 3] = 0.5
    gt = [np.eye(4, dtype=np.float32)]
    for _ in range(n_frames - 1):
        gt.append((gt[-1] @ step).astype(np.float32))

    def scan_image(pose):
        inv = np.linalg.inv(pose)
        pts = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        return np.asarray(project(pts))

    def run(use_scans):
        cfg = SlamConfig(
            keyframe_distance=0.4, window_size=16, optimize_every=3,
            use_scan_factors=use_scans, scan_max_dist=1.0,
            gn=pg.GaussNewtonConfig(iterations=5),
        )
        slam = SlidingWindowSLAM(cfg, scan_sensor=SENSOR)
        slam.kf_payloads[0] = scan_image(gt[0])
        noise = np.random.default_rng(9)
        for k in range(1, n_frames):
            rel = np.linalg.inv(gt[k - 1]) @ gt[k]
            xi = noise.standard_normal(6).astype(np.float32) * 0.02
            noisy = rel @ np.asarray(se3.se3_exp(jnp.asarray(xi)))
            q = Q.mat_to_quat(jnp.asarray(noisy[:3, :3].astype(np.float32)))
            slam.add_frame(np.asarray(q), noisy[:3, 3], payload=scan_image(gt[k]))
        slam.optimize_window()
        return slam

    slam_scan = run(True)
    slam_odo = run(False)

    def ate(slam):
        est = np.stack(slam.kf_poses)
        return np.mean([
            np.linalg.norm(est[i][:3, 3] - gt[i][:3, 3])
            for i in range(min(len(est), len(gt)))
        ])

    e_scan, e_odo = ate(slam_scan), ate(slam_odo)
    assert e_scan < e_odo * 0.7, (e_scan, e_odo)


def test_icp_refine_recovers_pose():
    """icp_refine polishes a perturbed initial guess to ~cm accuracy on a
    well-constrained scene (walls in 3 directions + floor).

    The scene must be DENSELY sampled: compute_normals needs all four
    range-image neighbors valid, so sparse walls lose their normals and the
    pose becomes unobservable in x/y — point-to-plane ICP's classic failure
    mode, and why loop-closure *measurement* uses the network
    (OdometryStream.measure_relative) with ICP only as a dense-geometry
    utility."""
    rng = np.random.default_rng(3)
    world = boxy_scene(rng, n=16 * 8192)

    def scan_from(pose):
        local = (world - pose[:3, 3]) @ pose[:3, :3]
        keep = np.linalg.norm(local[:, :2], axis=1) < 12.0
        return project(local[keep])

    t_true = np.eye(4)
    c, s = np.cos(0.03), np.sin(0.03)
    t_true[:2, :2] = [[c, -s], [s, c]]
    t_true[:3, 3] = [0.4, 0.15, 0.02]     # j's pose in i's frame (i_T_j)
    img_i = scan_from(np.eye(4))
    img_j = scan_from(t_true)

    pert = np.eye(4)
    c, s = np.cos(0.01), np.sin(0.01)
    pert[:2, :2] = [[c, -s], [s, c]]
    pert[:3, 3] = [0.08, -0.05, 0.02]
    t0 = jnp.asarray(t_true @ pert, dtype=jnp.float32)

    t, inlier_frac, rms = sfm.icp_refine(
        img_i, img_j, t0, SENSOR, iters=10, max_dist=1.0, subsample=1
    )
    t = np.asarray(t, dtype=np.float64)
    err_t = np.linalg.norm(t[:3, 3] - t_true[:3, 3])
    err_r = np.degrees(np.arccos(np.clip(
        (np.trace(t[:3, :3].T @ t_true[:3, :3]) - 1) / 2, -1, 1)))
    assert err_t < 0.02, err_t          # 8 cm init -> < 2 cm
    assert err_r < 0.2, err_r
    assert float(inlier_frac) > 0.2
    assert float(rms) < 0.05
