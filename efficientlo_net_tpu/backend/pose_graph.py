"""Windowed pose-graph optimization with distributed factor reduction.

Beyond-reference component (the reference is pure frame-to-frame odometry,
SURVEY.md §0/C23); designed per BASELINE.json north_star: keyframe poses in a
sliding window, odometry + loop-closure factors, Gauss-Newton /
Levenberg-Marquardt on SE(3), with

* factor Jacobians from ``jax.jacfwd`` on the SE(3) Exp/Log residual
  (no hand-derived block formulas),
* normal-equation assembly as one big segment-sum (vectorized over factors),
* distributed reduction: factors sharded across the device mesh with
  ``shard_map``; each device reduces its shard's (H, b) contribution and a
  ``psum`` over ICI assembles the window system (every device then solves the
  small dense system redundantly),
* sliding-window marginalization via Schur complement on the eliminated
  poses' blocks.

State convention: node i holds world_T_i (4, 4).  A factor (i, j, Z, w)
constrains Z ≈ T_i^-1 T_j with residual r = Log(Z^-1 T_i^-1 T_j) and weight
w (scalar information multiplier; anisotropic 6x6 information also accepted).
Local update: T_i <- T_i Exp(delta_i).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import se3


@dataclasses.dataclass
class FactorGraph:
    """Static-shape factor container (padded to a fixed capacity).

    Registered as a JAX pytree (num_nodes static) so jitted solvers cache
    by shape instead of retracing per call."""

    src: jnp.ndarray      # (F,) int32 node index i
    dst: jnp.ndarray      # (F,) int32 node index j
    meas: jnp.ndarray     # (F, 4, 4) measured relative transform Z
    weight: jnp.ndarray   # (F,) or (F, 6, 6) information weight
    valid: jnp.ndarray    # (F,) float 1/0 padding mask
    # (F,) float 1/0: factors eligible for the IRLS robust kernel (all-ones
    # by default; e.g. loop closures only, keeping odometry-chain factors
    # quadratic — a chain link with a moderate residual must not deweight)
    robust_mask: jnp.ndarray
    num_nodes: int


jax.tree_util.register_pytree_node(
    FactorGraph,
    lambda fg: ((fg.src, fg.dst, fg.meas, fg.weight, fg.valid,
                 fg.robust_mask), fg.num_nodes),
    lambda aux, leaves: FactorGraph(*leaves, num_nodes=aux),
)


def make_factors(src, dst, meas, weight=None, num_nodes=None, capacity=None,
                 robust_mask=None) -> FactorGraph:
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    meas = np.asarray(meas, dtype=np.float32)
    f = len(src)
    if weight is None:
        weight = np.ones((f,), dtype=np.float32)
    weight = np.asarray(weight, dtype=np.float32)
    if robust_mask is None:
        robust_mask = np.ones((f,), dtype=np.float32)
    robust_mask = np.asarray(robust_mask, dtype=np.float32)
    if num_nodes is None:
        num_nodes = int(max(src.max(), dst.max())) + 1
    valid = np.ones((f,), dtype=np.float32)
    if capacity is not None and capacity > f:
        pad = capacity - f
        src = np.concatenate([src, np.zeros(pad, np.int32)])
        dst = np.concatenate([dst, np.zeros(pad, np.int32)])
        meas = np.concatenate([meas, np.tile(np.eye(4, dtype=np.float32), (pad, 1, 1))])
        wpad_shape = (pad,) + weight.shape[1:]
        weight = np.concatenate([weight, np.zeros(wpad_shape, np.float32)])
        valid = np.concatenate([valid, np.zeros(pad, np.float32)])
        robust_mask = np.concatenate([robust_mask, np.ones(pad, np.float32)])
    return FactorGraph(
        src=jnp.asarray(src), dst=jnp.asarray(dst), meas=jnp.asarray(meas),
        weight=jnp.asarray(weight), valid=jnp.asarray(valid),
        robust_mask=jnp.asarray(robust_mask), num_nodes=num_nodes,
    )


def factor_residual(t_i, t_j, z):
    """r = Log(Z^-1 T_i^-1 T_j), shape (6,)."""
    return se3.se3_log(se3.se3_inv(z) @ se3.se3_inv(t_i) @ t_j)


def _residual_and_jacobians(t_i, t_j, z):
    """Residual plus Jacobians w.r.t. local deltas of both endpoints."""

    def r_of(delta_i, delta_j):
        return factor_residual(
            t_i @ se3.se3_exp(delta_i), t_j @ se3.se3_exp(delta_j), z
        )

    zero = jnp.zeros((6,), dtype=t_i.dtype)
    r = r_of(zero, zero)
    j_i = jax.jacfwd(lambda d: r_of(d, zero))(zero)  # (6, 6)
    j_j = jax.jacfwd(lambda d: r_of(zero, d))(zero)  # (6, 6)
    return r, j_i, j_j


def _accumulate(poses, factors: FactorGraph, robust=None):
    """Per-shard (H, b, chi2) from a block of factors — vectorized.

    ``robust = (kernel, delta)`` scales each factor's information by an IRLS
    weight of the whitened residual norm chi = ||r||_Sigma:

    * ``("huber", d)``: min(1, d/chi) — bounds influence linearly; good for
      moderately heavy tails, still pulled by gross outliers.
    * ``("gm", d)``: Geman-McClure (d^2/(d^2+chi^2))^2 — redescending: a
      false loop closure's weight decays as chi^-4, effectively switching
      the factor off (the "switchable constraints" behavior).

    The reported chi2 is the corresponding robust cost rho(chi)."""
    t_i = poses[factors.src]
    t_j = poses[factors.dst]
    r, j_i, j_j = jax.vmap(_residual_and_jacobians)(t_i, t_j, factors.meas)

    if factors.weight.ndim == 1:
        info = factors.weight[:, None, None] * jnp.broadcast_to(
            jnp.eye(6, dtype=r.dtype), (r.shape[0], 6, 6)
        )
    else:
        info = factors.weight
    info = info * factors.valid[:, None, None]

    if robust is not None:
        kernel, delta = robust
        chi_sq = jnp.maximum(
            (r[:, None, :] @ info @ r[..., None])[:, 0, 0], 1e-12
        )                                        # (F,) whitened chi^2
        if kernel == "huber":
            chi_f = jnp.sqrt(chi_sq)
            scale = jnp.minimum(1.0, delta / chi_f)
            rho = jnp.where(
                chi_f <= delta,
                chi_sq,
                delta * (2.0 * chi_f - delta),
            )
        elif kernel == "gm":
            d2 = delta * delta
            scale = (d2 / (d2 + chi_sq)) ** 2
            rho = d2 * chi_sq / (d2 + chi_sq)
        else:
            raise ValueError(f"unknown robust kernel {kernel!r}")
        # factors outside robust_mask stay quadratic (scale 1, rho = chi^2)
        scale = jnp.where(factors.robust_mask > 0, scale, 1.0)
        rho = jnp.where(factors.robust_mask > 0, rho, chi_sq)
        info = info * scale[:, None, None]

    n = poses.shape[0]
    dim = 6 * n

    wr = (info @ r[..., None])[..., 0]          # (F, 6)
    chi2 = jnp.sum(r * wr)
    if robust is not None:
        chi2 = jnp.sum(rho * factors.valid)

    # block contributions
    h_ii = jnp.swapaxes(j_i, -1, -2) @ info @ j_i   # (F, 6, 6)
    h_jj = jnp.swapaxes(j_j, -1, -2) @ info @ j_j
    h_ij = jnp.swapaxes(j_i, -1, -2) @ info @ j_j
    b_i = (jnp.swapaxes(j_i, -1, -2) @ wr[..., None])[..., 0]
    b_j = (jnp.swapaxes(j_j, -1, -2) @ wr[..., None])[..., 0]

    h = jnp.zeros((dim, dim), dtype=r.dtype)
    b = jnp.zeros((dim,), dtype=r.dtype)

    def scatter_block(h, blocks, rows, cols):
        # rows/cols: (F,) node indices; blocks: (F, 6, 6)
        fi = jnp.arange(6)
        rr = rows[:, None] * 6 + fi[None, :]          # (F, 6)
        cc = cols[:, None] * 6 + fi[None, :]
        idx_r = jnp.repeat(rr[:, :, None], 6, axis=2)  # (F, 6, 6)
        idx_c = jnp.repeat(cc[:, None, :], 6, axis=1)
        return h.at[idx_r, idx_c].add(blocks)

    h = scatter_block(h, h_ii, factors.src, factors.src)
    h = scatter_block(h, h_jj, factors.dst, factors.dst)
    h = scatter_block(h, h_ij, factors.src, factors.dst)
    h = scatter_block(h, jnp.swapaxes(h_ij, -1, -2), factors.dst, factors.src)

    bb = b.reshape(n, 6)
    bb = bb.at[factors.src].add(b_i)
    bb = bb.at[factors.dst].add(b_j)
    return h, bb.reshape(-1), chi2


@dataclasses.dataclass(frozen=True)
class GaussNewtonConfig:
    iterations: int = 10
    damping: float = 1e-6
    prior_weight: float = 1e6  # gauge fix on node 0
    # IRLS robustification threshold on the whitened residual norm
    # ||r||_Sigma; None disables.  ~1.0 leaves healthy residuals untouched.
    robust_delta: "float | None" = None
    # "huber" (bounded influence) or "gm" (Geman-McClure, redescending:
    # gross outliers such as false loop closures are switched off)
    robust_kernel: str = "huber"

    @property
    def robust(self):
        return (
            None if self.robust_delta is None
            else (self.robust_kernel, self.robust_delta)
        )


@dataclasses.dataclass
class PriorFactor:
    """Dense Gaussian prior left behind by Schur marginalization.

    Quadratic cost 0.5 d^T H d + b^T d over the stacked local deltas
    d_i = Log(lin_T_i^-1 T_i) of the covered nodes (right-multiplicative
    convention, matching the solver's update T <- T Exp(delta))."""

    node_ids: np.ndarray     # (m,) node indices (window-local; static)
    h: jnp.ndarray           # (6m, 6m)
    b: jnp.ndarray           # (6m,)
    lin_poses: jnp.ndarray   # (m, 4, 4) linearization points

    def shifted(self, new_ids: np.ndarray) -> "PriorFactor":
        """Same prior, re-labelled with new node indices."""
        return PriorFactor(
            node_ids=np.asarray(new_ids), h=self.h, b=self.b,
            lin_poses=self.lin_poses,
        )


jax.tree_util.register_pytree_node(
    PriorFactor,
    lambda p: ((p.h, p.b, p.lin_poses), tuple(int(i) for i in p.node_ids)),
    lambda aux, leaves: PriorFactor(
        node_ids=np.asarray(aux, dtype=np.int64), h=leaves[0], b=leaves[1],
        lin_poses=leaves[2],
    ),
)


def _prior_contribution(poses, prior: PriorFactor):
    """(H_add, b_add, chi2_add) of the marginalization prior at ``poses``.
    Matmul precision HIGHEST for the same reason as ``_optimize_jit`` (this
    is also called eagerly by the sliding window's prior bookkeeping)."""
    with jax.default_matmul_precision("highest"):
        return _prior_contribution_impl(poses, prior)


def _prior_contribution_impl(poses, prior: PriorFactor):
    n = poses.shape[0]
    dim = 6 * n
    ids = np.asarray(prior.node_ids)
    sel = jnp.asarray(
        (ids[:, None] * 6 + np.arange(6)[None, :]).reshape(-1)
    )
    t = poses[jnp.asarray(ids)]
    delta = jax.vmap(lambda lin, cur: se3.se3_log(se3.se3_inv(lin) @ cur))(
        prior.lin_poses.astype(poses.dtype), t
    ).reshape(-1)                                   # (6m,)
    grad = prior.b + prior.h @ delta                # d/d(delta) of the cost
    chi2 = 0.5 * delta @ prior.h @ delta + prior.b @ delta

    h_add = jnp.zeros((dim, dim), dtype=poses.dtype)
    h_add = h_add.at[sel[:, None], sel[None, :]].add(prior.h.astype(poses.dtype))
    b_add = jnp.zeros((dim,), dtype=poses.dtype).at[sel].add(
        grad.astype(poses.dtype)
    )
    return h_add, b_add, chi2


def _solve_step(poses, factors, cfg: GaussNewtonConfig, reduce_fn, prior=None,
                scan_terms=None):
    h, b, chi2 = reduce_fn(poses, factors)
    n = poses.shape[0]
    dim = 6 * n
    if scan_terms is not None:
        scan_factors, scan_reduce = scan_terms
        h_s, b_s, chi2_s = scan_reduce(poses, scan_factors)
        h = h + h_s
        b = b + b_s
        chi2 = chi2 + chi2_s
    if prior is not None:
        h_p, b_p, chi2_p = _prior_contribution(poses, prior)
        h = h + h_p
        b = b + b_p
        chi2 = chi2 + chi2_p
    # gauge prior on node 0
    gauge = jnp.zeros((dim,)).at[:6].set(cfg.prior_weight)
    h = h + jnp.diag(gauge) + cfg.damping * jnp.eye(dim, dtype=h.dtype)
    delta = jnp.linalg.solve(h, -b).reshape(n, 6)
    new_poses = poses @ se3.se3_exp(delta)
    return new_poses, chi2


def optimize(
    poses: jnp.ndarray,
    factors: FactorGraph,
    cfg: GaussNewtonConfig = GaussNewtonConfig(),
    mesh=None,
    prior: "PriorFactor | None" = None,
    scan_factors=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on the window.  Returns (poses, chi2 history).

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), factors are sharded over the
    mesh axis and the (H, b) reduction runs distributed with a psum.
    ``prior`` carries marginalized keyframes' information (see PriorFactor).
    ``scan_factors`` (a ``scan_factors.ScanFactorSet``) adds point-to-plane
    residuals from the keyframes' range images, re-linearized every
    iteration; with a mesh, their point blocks are sharded over the axis
    (map-block partitioning) and psum-reduced.
    """
    return _optimize_jit(
        poses, factors, prior, scan_factors, cfg=cfg, mesh=mesh
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def _optimize_jit(poses, factors, prior, scan_factors, *, cfg, mesh):
    """Jitted Gauss-Newton core: caches by (shapes, cfg, mesh) so repeated
    window optimizations (sliding-window SLAM) compile once per shape
    bucket instead of retracing every call.

    The whole trace runs under matmul precision HIGHEST: on TPU, f32
    matmuls otherwise route through the MXU's bf16 operand passes — fine
    for the network, catastrophic for normal equations (a zero-residual
    odometry chain came back with 8.5 m of position error on a 121-keyframe
    window solve; exact to 0.1 mm on CPU / with HIGHEST).  The solver's
    matrices are (6n x 6n) at n<=20 — precision costs nothing here.
    """
    with jax.default_matmul_precision("highest"):
        return _optimize_traced(
            poses, factors, prior, scan_factors, cfg=cfg, mesh=mesh
        )


def _optimize_traced(poses, factors, prior, scan_factors, *, cfg, mesh):
    if mesh is None:
        reduce_fn = partial(_accumulate, robust=cfg.robust)
    else:
        reduce_fn = _make_distributed_reduce(
            mesh, factors.num_nodes, robust=cfg.robust
        )

    scan_terms = None
    if scan_factors is not None:
        from .scan_factors import (
            accumulate_scan_factors,
            make_distributed_scan_reduce,
        )

        scan_reduce = (
            accumulate_scan_factors if mesh is None
            else make_distributed_scan_reduce(mesh)
        )
        scan_terms = (scan_factors, scan_reduce)

    def body(carry, _):
        poses, _ = carry
        new_poses, chi2 = _solve_step(
            poses, factors, cfg, reduce_fn, prior, scan_terms
        )
        return (new_poses, chi2), chi2

    (final, _), history = jax.lax.scan(
        body, (poses, jnp.float32(0.0)), None, length=cfg.iterations
    )
    return final, history


def _make_distributed_reduce(mesh, num_nodes, robust=None):
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    axis = mesh.axis_names[0]

    def sharded(poses, factors: FactorGraph):
        def local(poses, src, dst, meas, weight, valid, rmask):
            fg = FactorGraph(
                src=src, dst=dst, meas=meas, weight=weight, valid=valid,
                robust_mask=rmask, num_nodes=num_nodes,
            )
            h, b, chi2 = _accumulate(poses, fg, robust=robust)
            return (
                jax.lax.psum(h, axis),
                jax.lax.psum(b, axis),
                jax.lax.psum(chi2, axis),
            )

        w_spec = P(axis) if factors.weight.ndim == 1 else P(axis, None, None)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis, None, None), w_spec,
                      P(axis), P(axis)),
            out_specs=(P(), P(), P()),
        )(poses, factors.src, factors.dst, factors.meas, factors.weight,
          factors.valid, factors.robust_mask)

    return sharded


# ---------------------------------------------------------------------------
# sliding-window marginalization (Schur complement)
# ---------------------------------------------------------------------------

def marginalize(
    h: jnp.ndarray, b: jnp.ndarray, keep: np.ndarray, drop: np.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Schur-complement elimination of the ``drop`` nodes from (H, b).

    Returns the reduced system over ``keep`` nodes:
      H' = H_kk - H_kd H_dd^-1 H_dk,   b' = b_k - H_kd H_dd^-1 b_d
    — the information-preserving prior left behind when old keyframes leave
    the window.
    """
    def block_ids(nodes):
        return (np.asarray(nodes)[:, None] * 6 + np.arange(6)[None, :]).reshape(-1)

    ki = block_ids(keep)
    di = block_ids(drop)
    with jax.default_matmul_precision("highest"):  # see _optimize_jit
        h_kk = h[np.ix_(ki, ki)]
        h_kd = h[np.ix_(ki, di)]
        h_dd = h[np.ix_(di, di)]
        b_k = b[ki]
        b_d = b[di]
        # small diagonal regularization for numerical stability
        h_dd = h_dd + 1e-8 * jnp.eye(h_dd.shape[0], dtype=h.dtype)
        sol = jnp.linalg.solve(
            h_dd, jnp.concatenate([h_kd.T, b_d[:, None]], axis=1)
        )
        h_dd_inv_h_dk = sol[:, :-1]
        h_dd_inv_b_d = sol[:, -1]
        h_new = h_kk - h_kd @ h_dd_inv_h_dk
        b_new = b_k - h_kd @ h_dd_inv_b_d
        return h_new, b_new


def assemble_system(poses, factors: FactorGraph):
    """Public (H, b, chi2) assembly — for marginalization workflows."""
    with jax.default_matmul_precision("highest"):  # see _optimize_jit
        return _accumulate(poses, factors)
