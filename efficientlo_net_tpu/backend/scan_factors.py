"""Point-to-plane scan factors from range images, with distributed
map-block reduction.

Beyond-reference component (BASELINE.json north_star: "windowed pose-graph /
BA backend ... optional point-to-plane factors from the range images").  The
reference stops at frame-to-frame odometry (SURVEY.md §0/C23); here keyframe
range images contribute geometric residuals to the window optimization:

* surface normals estimated directly on the ordered (H, W) range image —
  cross product of azimuth/elevation central differences, with cylindrical
  W wrap (the same layout trick the whole framework is built on, reference
  model_util.py:181-292);
* projective data association: frame-j points are warped by the current
  relative pose and looked up in frame i's range image (one gather per point
  — no KD-tree, the range image *is* the spatial index);
* residual per correspondence: r = n_i . (T_i^-1 T_j p_j - q_i), the
  point-to-plane distance, with Jacobians from ``jax.jacfwd`` on the SE(3)
  right-delta (same autodiff-first convention as backend/pose_graph.py);
* map-block partitioning: the correspondence axis is sharded over a device
  mesh with ``shard_map``; each device reduces its block's (H, b)
  contribution and a ``psum`` assembles the window system (the distributed
  Schur pattern of pose_graph._make_distributed_reduce, applied to dense
  scan geometry).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SensorConfig
from ..ops import se3
from ..ops.projection import pixel_coords

_VALID_EPS = 1e-10


def compute_normals(
    xyz_img: jnp.ndarray,
    min_norm: float = 1e-6,
    planarity_tol: float = 0.1,
):
    """Per-pixel surface normals of a (H, W, 3) range image.

    n = normalize(d_azimuth x d_elevation) via central differences; the W
    axis wraps cylindrically, the H axis clamps.  Returns (normals (H, W, 3),
    valid (H, W) bool); normals are zero where invalid.  Sign is made
    consistent by orienting every normal toward the sensor origin.

    ``planarity_tol`` (meters) rejects pixels whose 4-neighborhood does not
    lie on the fitted plane — i.e. depth-discontinuity and surface-boundary
    pixels, whose cross-product "normals" would bias point-to-plane
    residuals.
    """
    valid = jnp.sum(xyz_img * xyz_img, axis=-1) > _VALID_EPS

    left = jnp.roll(xyz_img, 1, axis=1)
    right = jnp.roll(xyz_img, -1, axis=1)
    up = jnp.concatenate([xyz_img[:1], xyz_img[:-1]], axis=0)
    down = jnp.concatenate([xyz_img[1:], xyz_img[-1:]], axis=0)
    v_l = jnp.roll(valid, 1, axis=1)
    v_r = jnp.roll(valid, -1, axis=1)
    v_u = jnp.concatenate([valid[:1], valid[:-1]], axis=0)
    v_d = jnp.concatenate([valid[1:], valid[-1:]], axis=0)

    d_az = right - left
    d_el = down - up
    n = jnp.cross(d_az, d_el)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = valid & v_l & v_r & v_u & v_d & (norm[..., 0] > min_norm)
    n = jnp.where(ok[..., None], n / jnp.maximum(norm, min_norm), 0.0)
    # planarity: all 4 neighbors must lie on the plane through the center
    flat = jnp.stack(
        [
            jnp.abs(jnp.sum(n * (nb - xyz_img), axis=-1))
            for nb in (left, right, up, down)
        ],
        axis=0,
    ).max(axis=0)
    ok = ok & (flat <= planarity_tol)
    n = jnp.where(ok[..., None], n, 0.0)
    # orient toward the sensor: n . p < 0 (p points away from origin)
    flip = jnp.sum(n * xyz_img, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    return n, ok


@dataclasses.dataclass
class Correspondences:
    """Fixed-size point-to-plane correspondence block for one scan pair."""

    p_j: jnp.ndarray   # (P, 3) points in frame j
    q_i: jnp.ndarray   # (P, 3) anchor points in frame i
    n_i: jnp.ndarray   # (P, 3) unit normals in frame i
    w: jnp.ndarray     # (P,) weights (0 = padding / rejected)


def projective_association(
    xyz_j: jnp.ndarray,
    xyz_i: jnp.ndarray,
    normals_i: jnp.ndarray,
    t_ij: jnp.ndarray,
    sensor: SensorConfig,
    max_dist: float = 1.0,
    normals_j: Optional[jnp.ndarray] = None,
    min_normal_dot: float = 0.8,
    max_plane_dist: Optional[float] = None,
) -> Correspondences:
    """Associate every valid frame-j pixel with a frame-i surface patch.

    xyz_j / xyz_i: (H, W, 3) range images; t_ij: (4, 4) current estimate of
    i_T_j.  Frame-j points are warped into frame i, projected onto frame i's
    grid (``pixel_coords`` — the same truncation semantics as the network's
    re-projections), and matched with the anchor point + normal at that
    pixel.  All shapes static: P = H * W.

    Gating (each rejected pair gets weight 0):
      * euclidean distance > ``max_dist``;
      * |point-to-plane distance| > ``max_plane_dist`` (defaults to
        ``max_dist / 2`` — rejects cross-plane matches that bias the
        optimum);
      * when ``normals_j`` is given: rotated frame-j normal disagreeing with
        the anchor normal (dot < ``min_normal_dot``) — the standard
        normal-consistency filter.
    """
    h, w, _ = xyz_j.shape
    p = xyz_j.reshape(-1, 3)
    valid_j = jnp.sum(p * p, axis=-1) > _VALID_EPS

    p_in_i = p @ t_ij[:3, :3].T + t_ij[:3, 3]
    row, col, valid_proj, _ = pixel_coords(p_in_i, h, w, sensor)
    flat = row * w + col

    q = xyz_i.reshape(-1, 3)[flat]
    n = normals_i.reshape(-1, 3)[flat]
    valid_i = (jnp.sum(q * q, axis=-1) > _VALID_EPS) & (
        jnp.sum(n * n, axis=-1) > 0.5
    )
    dist = jnp.linalg.norm(p_in_i - q, axis=-1)
    plane_dist = jnp.abs(jnp.sum(n * (p_in_i - q), axis=-1))
    if max_plane_dist is None:
        max_plane_dist = max_dist / 2.0
    ok = (
        valid_j & valid_proj & valid_i
        & (dist <= max_dist) & (plane_dist <= max_plane_dist)
    )
    if normals_j is not None:
        nj = normals_j.reshape(-1, 3) @ t_ij[:3, :3].T
        ok = ok & (jnp.sum(n * nj, axis=-1) >= min_normal_dot)
    weight = ok.astype(xyz_j.dtype)
    return Correspondences(p_j=p, q_i=q, n_i=n, w=weight)


@dataclasses.dataclass
class ScanFactorSet:
    """Point-to-plane factors between window nodes (padded, static shapes)."""

    src: jnp.ndarray   # (S,) int32 node i (anchor frame)
    dst: jnp.ndarray   # (S,) int32 node j (point frame)
    p_j: jnp.ndarray   # (S, P, 3)
    q_i: jnp.ndarray   # (S, P, 3)
    n_i: jnp.ndarray   # (S, P, 3)
    w: jnp.ndarray     # (S, P)


jax.tree_util.register_pytree_node(
    ScanFactorSet,
    lambda s: ((s.src, s.dst, s.p_j, s.q_i, s.n_i, s.w), None),
    lambda aux, leaves: ScanFactorSet(*leaves),
)


def make_scan_factors(pairs, correspondences) -> ScanFactorSet:
    """pairs: [(i, j)] node ids; correspondences: [Correspondences]."""
    src = jnp.asarray(np.array([p[0] for p in pairs], dtype=np.int32))
    dst = jnp.asarray(np.array([p[1] for p in pairs], dtype=np.int32))
    return ScanFactorSet(
        src=src, dst=dst,
        p_j=jnp.stack([c.p_j for c in correspondences]),
        q_i=jnp.stack([c.q_i for c in correspondences]),
        n_i=jnp.stack([c.n_i for c in correspondences]),
        w=jnp.stack([c.w for c in correspondences]),
    )


def _point_residual(t_i, t_j, p, q, n):
    """r = n . (T_i^-1 T_j p - q); scalar."""
    x_w = t_j[:3, :3] @ p + t_j[:3, 3]
    x_i = t_i[:3, :3].T @ (x_w - t_i[:3, 3])
    return jnp.dot(n, x_i - q)


def _point_residual_and_jacobians(t_i, t_j, p, q, n):
    """Residual + Jacobians w.r.t. right-multiplicative deltas of both
    poses (same convention as pose_graph._residual_and_jacobians)."""

    def r_of(d_i, d_j):
        return _point_residual(
            t_i @ se3.se3_exp(d_i), t_j @ se3.se3_exp(d_j), p, q, n
        )

    zero = jnp.zeros((6,), dtype=t_i.dtype)
    r = r_of(zero, zero)
    j_i = jax.jacfwd(lambda d: r_of(d, zero))(zero)  # (6,)
    j_j = jax.jacfwd(lambda d: r_of(zero, d))(zero)  # (6,)
    return r, j_i, j_j


def _pair_blocks(t_i, t_j, p_j, q_i, n_i, w):
    """One scan pair's weighted normal-equation blocks, reduced over points.

    Returns (h_ii, h_ij, h_jj (6,6), b_i, b_j (6,), chi2).
    """
    r, j_i, j_j = jax.vmap(
        _point_residual_and_jacobians, in_axes=(None, None, 0, 0, 0)
    )(t_i, t_j, p_j, q_i, n_i)
    wr = w * r
    h_ii = jnp.einsum("p,pa,pb->ab", w, j_i, j_i)
    h_jj = jnp.einsum("p,pa,pb->ab", w, j_j, j_j)
    h_ij = jnp.einsum("p,pa,pb->ab", w, j_i, j_j)
    b_i = jnp.einsum("pa,p->a", j_i, wr)
    b_j = jnp.einsum("pa,p->a", j_j, wr)
    chi2 = jnp.sum(wr * r)
    return h_ii, h_ij, h_jj, b_i, b_j, chi2


def accumulate_scan_factors(poses, sf: ScanFactorSet):
    """(H, b, chi2) over the window from all scan factors — vectorized over
    pairs, reduced over points."""
    t_i = poses[sf.src]
    t_j = poses[sf.dst]
    h_ii, h_ij, h_jj, b_i, b_j, chi2 = jax.vmap(_pair_blocks)(
        t_i, t_j, sf.p_j, sf.q_i, sf.n_i, sf.w
    )

    n = poses.shape[0]
    dim = 6 * n
    h = jnp.zeros((dim, dim), dtype=poses.dtype)
    fi = jnp.arange(6)
    rr = sf.src[:, None] * 6 + fi[None, :]
    cc = sf.dst[:, None] * 6 + fi[None, :]

    def scatter(h, blocks, rows, cols):
        idx_r = jnp.repeat(rows[:, :, None], 6, axis=2)
        idx_c = jnp.repeat(cols[:, None, :], 6, axis=1)
        return h.at[idx_r, idx_c].add(blocks)

    h = scatter(h, h_ii, rr, rr)
    h = scatter(h, h_jj, cc, cc)
    h = scatter(h, h_ij, rr, cc)
    h = scatter(h, jnp.swapaxes(h_ij, -1, -2), cc, rr)

    b = jnp.zeros((n, 6), dtype=poses.dtype)
    b = b.at[sf.src].add(b_i)
    b = b.at[sf.dst].add(b_j)
    return h, b.reshape(-1), jnp.sum(chi2)


def make_distributed_scan_reduce(mesh):
    """Map-block partitioning: the point axis of every scan factor is sharded
    over the mesh axis; each device reduces its block and ``psum`` assembles
    the window system (cross-host over DCN, intra-host over ICI)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def reduce_fn(poses, sf: ScanFactorSet):
        def local(poses, src, dst, p_j, q_i, n_i, w):
            block = ScanFactorSet(
                src=src, dst=dst, p_j=p_j, q_i=q_i, n_i=n_i, w=w
            )
            h, b, chi2 = accumulate_scan_factors(poses, block)
            return (
                jax.lax.psum(h, axis),
                jax.lax.psum(b, axis),
                jax.lax.psum(chi2, axis),
            )

        pt = P(None, axis, None)   # shard the point axis (map blocks)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), pt, pt, pt, P(None, axis)),
            out_specs=(P(), P(), P()),
        )(poses, sf.src, sf.dst, sf.p_j, sf.q_i, sf.n_i, sf.w)

    return reduce_fn


def correspondences_for_pair(
    xyz_i: jnp.ndarray,
    xyz_j: jnp.ndarray,
    t_i: jnp.ndarray,
    t_j: jnp.ndarray,
    sensor: SensorConfig,
    max_dist: float = 1.0,
    subsample: Optional[int] = None,
) -> Correspondences:
    """Convenience: normals on both frames + normal-gated projective
    association of frame j at the current estimate i_T_j = T_i^-1 T_j."""
    normals, _ = compute_normals(xyz_i)
    normals_j, _ = compute_normals(xyz_j)
    t_ij = se3.se3_inv(jnp.asarray(t_i)) @ jnp.asarray(t_j)
    corr = projective_association(
        xyz_j, xyz_i, normals, t_ij, sensor, max_dist, normals_j=normals_j
    )
    if subsample:
        corr = Correspondences(
            p_j=corr.p_j[::subsample],
            q_i=corr.q_i[::subsample],
            n_i=corr.n_i[::subsample],
            w=corr.w[::subsample],
        )
    return corr


# ---------------------------------------------------------------------------
# pairwise ICP refinement (loop-closure measurement sharpening)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("sensor", "iters", "subsample"))
def icp_refine(
    xyz_i: jnp.ndarray,
    xyz_j: jnp.ndarray,
    t_ij0: jnp.ndarray,
    sensor: SensorConfig,
    iters: int = 12,
    max_dist: float = 2.0,
    subsample: int = 2,
):
    """Point-to-plane ICP between two range images, re-associating every
    iteration, starting from ``t_ij0`` (an initial guess of i_T_j — e.g. a
    loop-closure measurement from the odometry network).

    The network is trained on consecutive-frame motion (~0.6-0.9 m); a
    revisit pair sits meters apart, so its raw measurement is only a seed.
    This polishes it against the actual surfaces (the same projective
    association + point-to-plane residual the window scan factors use) and
    returns diagnostics for acceptance gating:

        (t_ij, inlier_frac, rms)

    * ``inlier_frac`` — fraction of valid frame-j pixels that associated in
      the final iteration (0 when the pair does not overlap);
    * ``rms`` — weighted RMS point-to-plane residual (meters) at the result.

    Left-multiplicative update: T <- Exp(delta) T with delta = (v, w)
    (se3.se3_exp twist ordering), so each row's Jacobian is
    J = [n, (T p) x n].  All shapes static; the whole loop is one jitted
    ``lax.scan`` (one device dispatch per call — SLAM replay through the
    remote-TPU tunnel is dispatch-latency-bound, STATUS.md round 3).
    """
    normals_i, _ = compute_normals(xyz_i)
    normals_j, _ = compute_normals(xyz_j)
    s = max(1, subsample)
    p_all = xyz_j.reshape(-1, 3)[::s]
    nj_all = normals_j.reshape(-1, 3)[::s]
    valid_j = jnp.sum(p_all * p_all, axis=-1) > _VALID_EPS
    n_valid = jnp.maximum(jnp.sum(valid_j.astype(jnp.float32)), 1.0)
    h, w, _ = xyz_i.shape
    q_img = xyz_i.reshape(-1, 3)
    n_img = normals_i.reshape(-1, 3)

    def associate(t):
        y = p_all @ t[:3, :3].T + t[:3, 3]
        row, col, valid_proj, _ = pixel_coords(y, h, w, sensor)
        flat = row * w + col
        q = q_img[flat]
        n = n_img[flat]
        valid_i = (jnp.sum(q * q, axis=-1) > _VALID_EPS) & (
            jnp.sum(n * n, axis=-1) > 0.5
        )
        dist = jnp.linalg.norm(y - q, axis=-1)
        r = jnp.sum(n * (y - q), axis=-1)
        nj_rot = nj_all @ t[:3, :3].T
        ok = (
            valid_j & valid_proj & valid_i
            & (dist <= max_dist) & (jnp.abs(r) <= max_dist / 2.0)
            & (jnp.sum(n * nj_rot, axis=-1) >= 0.8)
        )
        return y, q, n, r, ok.astype(xyz_i.dtype)

    def step(t, _):
        y, q, n, r, wgt = associate(t)
        jac = jnp.concatenate([n, jnp.cross(y, n)], axis=-1)   # (P, 6)
        a = (jac * wgt[:, None]).T @ jac + 1e-6 * jnp.eye(6, dtype=t.dtype)
        g = (jac * wgt[:, None]).T @ r
        delta = -jnp.linalg.solve(a, g)
        t_new = se3.se3_exp(delta) @ t
        return t_new, None

    with jax.default_matmul_precision("highest"):  # see pose_graph._optimize_jit
        t, _ = jax.lax.scan(step, t_ij0.astype(jnp.float32), None, length=iters)
        _, _, _, r, wgt = associate(t)
        inlier_frac = jnp.sum(wgt) / n_valid
        rms = jnp.sqrt(
            jnp.sum(wgt * r * r) / jnp.maximum(jnp.sum(wgt), 1.0)
        )
    return t, inlier_frac, rms
