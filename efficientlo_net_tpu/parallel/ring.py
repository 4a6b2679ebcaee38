"""W-axis (azimuth) ring sharding for the windowed neighbor ops.

The cylindrical range image's W=1800 azimuth axis is this workload's "long
axis" (SURVEY.md §5).  The reference handles it on one GPU with the
cylindrical wrap baked into its CUDA index arithmetic
(tf_ops/2d_conv_random_k/fused_conv_g.cu:89-97); on a TPU mesh the wrap *is*
the ring topology: split W into contiguous azimuth sectors, one per device
on a ``ring`` mesh axis, and exchange ``halo = kw // 2`` edge columns with
``jax.lax.ppermute`` — the ICI ring maps onto the cylinder with zero
impedance (docs/w_axis_sharding.md).

Semantics: selection on the halo-widened local block is candidate-order
identical to the unsharded op, so indices and masks are **bit-identical** to
``ops.neighbors.select_neighbors`` (tested in tests/test_ring.py at every
supported level geometry).

Divisibility requirements (guarded with ValueError):
  * R | W1 and R | W2 (both grids split into equal sectors),
  * R | n_w (equal center counts per shard),
  * center columns must tile sectors exactly (csw * n_w == W1),
  * strided source windows must align (sw * W2 == W1 when sw > 1),
  * halo <= W2 / R (single-hop ppermute; wider windows would need
    multi-hop exchange — at that point the shard is smaller than the
    window and sharding that level is not profitable, see design doc).

Full-res (W=1800) and the 225-column l0 grid satisfy these for R in
{3, 5, ...} (and R in {2,4,8,...} for full-res-only ops); the tiny coarse
grids (113 / 57 / 29 columns) stay replicated by design.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.neighbors import FIRST_K, KNN, window_offsets

_VALID_EPS = 1e-10


def halo_exchange_w(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Widen a (B, H, W_loc, C) block with ``halo`` columns from each ring
    neighbor via two ``ppermute``s.  With one device the exchange degenerates
    to the block's own wrap (cylinder of one sector)."""
    if halo == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    left_edge = x[:, :, :halo]
    right_edge = x[:, :, -halo:]
    if n == 1:
        return jnp.concatenate([right_edge, x, left_edge], axis=2)
    # my right edge becomes my right neighbor's left halo, and vice versa
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    return jnp.concatenate([from_left, x, from_right], axis=2)


def _select_on_block(
    xyz1_blk, xyz2_wide, ring_index,
    *, kernel_size, k, distance, center_stride, source_stride,
    halo, w1, w2, h2, mode, perm,
):
    """Windowed select for one azimuth sector against its halo-widened source
    block.  Candidate scan order matches the unsharded op exactly; returns
    GLOBAL flat indices into the (h2, w2) source grid."""
    b = xyz1_blk.shape[0]
    h1 = xyz1_blk.shape[1]
    w1_loc = xyz1_blk.shape[2]
    kh, kw = kernel_size
    t = kh * kw
    csh, csw = center_stride
    sh, sw = source_stride
    w2_loc = (xyz2_wide.shape[2] - 2 * halo)

    n_h = -(-h1 // csh)
    n_w_loc = w1_loc // csw
    n_loc = n_h * n_w_loc

    # centers: strided pixels of the local grid-1 block
    center_xyz = xyz1_blk[:, ::csh, ::csw].reshape(b, n_loc, 3)
    center_valid = jnp.sum(center_xyz * center_xyz, axis=-1) > _VALID_EPS

    # window base coordinates on the widened grid-2 block
    base_rows = (np.arange(0, n_h * csh, csh) // sh).astype(np.int32)
    base_cols_loc = ((np.arange(0, n_w_loc * csw, csw)) // sw + halo).astype(np.int32)
    base_r = jnp.asarray(np.repeat(base_rows, n_w_loc))   # (n_loc,)
    base_c = jnp.asarray(np.tile(base_cols_loc, n_h))     # (n_loc,)

    offs = jnp.asarray(window_offsets(kh, kw), dtype=jnp.int32)  # (T, 2)
    if perm is not None:
        offs = offs[perm]

    cand_h = base_r[:, None] + offs[None, :, 0]            # (n_loc, T)
    cand_c = base_c[:, None] + offs[None, :, 1]            # in-bounds by halo
    in_bounds = (cand_h >= 0) & (cand_h < h2)
    cand_flat = jnp.clip(cand_h, 0, h2 - 1) * xyz2_wide.shape[2] + cand_c

    xyz2_flat = xyz2_wide.reshape(b, -1, 3)
    cand_xyz = jnp.take(xyz2_flat, cand_flat.reshape(-1), axis=1)
    cand_xyz = cand_xyz.reshape(b, n_loc, t, 3)
    cand_valid = jnp.sum(cand_xyz * cand_xyz, axis=-1) > _VALID_EPS

    diff = cand_xyz - center_xyz[:, :, None, :]
    d_sq = jnp.maximum(jnp.sum(diff * diff, axis=-1), _VALID_EPS)

    ok = in_bounds[None] & cand_valid & (d_sq <= distance * distance) \
        & center_valid[:, :, None]

    if mode == FIRST_K:
        pos = jnp.arange(t, dtype=jnp.float32)
        score = jnp.where(ok, t - pos, -1.0)
        threshold = 0.0
    elif mode == KNN:
        score = jnp.where(ok, -d_sq, -jnp.inf)
        threshold = -jnp.inf
    else:
        raise ValueError(f"unknown mode {mode!r}")

    top_scores, top_pos = jax.lax.top_k(score, k)          # (B, n_loc, K)
    mask = top_scores > threshold

    # widened-block candidate -> global (h2, w2) flat index: subtract the halo
    # offset, add the sector start, wrap at the azimuth seam
    sel_h = jnp.take_along_axis(
        jnp.broadcast_to(cand_h[None], (b,) + cand_h.shape), top_pos, axis=-1
    )
    sel_c = jnp.take_along_axis(
        jnp.broadcast_to(cand_c[None], (b,) + cand_c.shape), top_pos, axis=-1
    )
    sel_h = jnp.clip(sel_h, 0, h2 - 1)
    global_c = jnp.mod(sel_c - halo + ring_index * w2_loc, w2)
    idx = jnp.where(mask, sel_h * w2 + global_c, 0)
    # block-local flat index into the widened (h2, w2_loc + 2*halo) source —
    # lets callers gather values without leaving the shard
    idx_local = jnp.where(mask, sel_h * xyz2_wide.shape[2] + sel_c, 0)

    # (B, n_h, n_w_loc, K) so the ring axis concatenates into raster order
    return (
        idx.astype(jnp.int32).reshape(b, n_h, n_w_loc, k),
        mask[..., None].astype(xyz1_blk.dtype).reshape(b, n_h, n_w_loc, k, 1),
        idx_local.astype(jnp.int32),
    )


def _validate(w1, w2, n_w, csw, sw, kw, ring_size):
    if w1 % ring_size or w2 % ring_size:
        raise ValueError(
            f"ring size {ring_size} must divide both grid widths ({w1}, {w2})"
        )
    if n_w % ring_size:
        raise ValueError(
            f"ring size {ring_size} must divide the center count {n_w}"
        )
    if csw * n_w != w1:
        raise ValueError(
            f"center stride {csw} does not tile W1={w1} exactly (n_w={n_w})"
        )
    if sw > 1 and sw * w2 != w1:
        raise ValueError(
            f"source stride {sw} does not map W1={w1} onto W2={w2} exactly"
        )
    halo = kw // 2
    if halo > w2 // ring_size:
        raise ValueError(
            f"halo {halo} exceeds the {w2 // ring_size}-column sector; "
            f"window ({kw}) is too wide for ring size {ring_size} — "
            "keep this level replicated (docs/w_axis_sharding.md)"
        )
    return halo


def ring_select_neighbors(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    *,
    mesh: Mesh,
    ring_axis: str = "ring",
    center_stride: Tuple[int, int] = (1, 1),
    source_stride: Tuple[int, int] = (1, 1),
    mode: str = KNN,
    perm: Optional[jnp.ndarray] = None,
):
    """Ring-sharded ``select_neighbors``: W-sharded windowed neighbor select
    with ppermute halo exchange.  Index/mask output is bit-identical to the
    unsharded op; outputs are global arrays sharded over the center axis.

    xyz1 (B, H1, W1, 3), xyz2 (B, H2, W2, 3) -> idx (B, N, K) int32 global
    flat indices into grid 2, mask (B, N, K, 1).
    """
    b, h1, w1, _ = xyz1.shape
    _, h2, w2, _ = xyz2.shape
    kh, kw = kernel_size
    csh, csw = center_stride
    sh, sw = source_stride
    n_h = -(-h1 // csh)
    n_w = -(-w1 // csw)
    ring_size = mesh.shape[ring_axis]
    halo = _validate(w1, w2, n_w, csw, sw, kw, ring_size)

    other_axes = tuple(a for a in mesh.axis_names if a != ring_axis)
    batch_axis = other_axes[0] if other_axes else None
    if batch_axis is not None and b % mesh.shape[batch_axis] != 0:
        batch_axis = None  # batch not divisible -> replicate over data axis

    def local(x1_blk, x2_blk):
        ring_index = jax.lax.axis_index(ring_axis)
        x2_wide = halo_exchange_w(x2_blk, halo, ring_axis)
        idx4, mask5, _ = _select_on_block(
            x1_blk, x2_wide, ring_index,
            kernel_size=(kh, kw), k=k, distance=float(distance),
            center_stride=(csh, csw), source_stride=(sh, sw),
            halo=halo, w1=w1, w2=w2, h2=h2, mode=mode, perm=perm,
        )
        return idx4, mask5

    in_spec = P(batch_axis, None, ring_axis, None)
    out_specs = (
        P(batch_axis, None, ring_axis, None),
        P(batch_axis, None, ring_axis, None, None),
    )
    idx4, mask5 = jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, in_spec), out_specs=out_specs,
    )(xyz1, xyz2)
    return idx4.reshape(b, n_h * n_w, k), mask5.reshape(b, n_h * n_w, k, 1)


def ring_select_and_group(
    xyz: jnp.ndarray,
    feats: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    *,
    mesh: Mesh,
    ring_axis: str = "ring",
    center_stride: Tuple[int, int] = (1, 1),
    mode: str = FIRST_K,
    perm: Optional[jnp.ndarray] = None,
):
    """Ring-sharded fused select + neighbor grouping (down_conv front end).

    The gather runs on the halo-widened local block — neighbor values for
    edge centers come from the exchanged halos, never from a global gather.
    Returns (grouped_xyz (B,N,K,3), grouped_feat (B,N,K,C), mask (B,N,K,1)),
    sharded over the center axis; numerically identical to
    ``ops.neighbors.select_and_group``.
    """
    b, h, w, _ = xyz.shape
    c = feats.shape[-1]
    kh, kw = kernel_size
    csh, csw = center_stride
    n_h = -(-h // csh)
    n_w = -(-w // csw)
    ring_size = mesh.shape[ring_axis]
    halo = _validate(w, w, n_w, csw, 1, kw, ring_size)

    other_axes = tuple(a for a in mesh.axis_names if a != ring_axis)
    batch_axis = other_axes[0] if other_axes else None
    if batch_axis is not None and b % mesh.shape[batch_axis] != 0:
        batch_axis = None  # batch not divisible -> replicate over data axis

    def local(xyz_blk, feat_blk):
        ring_index = jax.lax.axis_index(ring_axis)
        src_wide = halo_exchange_w(
            jnp.concatenate([xyz_blk, feat_blk], axis=-1), halo, ring_axis
        )
        xyz_wide = src_wide[..., :3]
        idx4, mask5, idx_local = _select_on_block(
            xyz_blk, xyz_wide, ring_index,
            kernel_size=(kh, kw), k=k, distance=float(distance),
            center_stride=(csh, csw), source_stride=(1, 1),
            halo=halo, w1=w, w2=w, h2=h, mode=mode, perm=perm,
        )
        bl = xyz_blk.shape[0]  # local batch (sharded over the data axis)
        n_w_loc = idx4.shape[2]
        n_loc = idx4.shape[1] * n_w_loc
        # purely local gather from the widened block — neighbor values for
        # edge centers are resident via the halo exchange
        flat_wide = src_wide.reshape(bl, -1, 3 + c)
        sel = jnp.take_along_axis(
            flat_wide, idx_local.reshape(bl, n_loc * k, 1), axis=1
        ).reshape(bl, n_loc, k, 3 + c)
        sel = sel * mask5.reshape(bl, n_loc, k, 1)
        return (
            sel[..., :3].reshape(bl, n_h, n_w_loc, k, 3),
            sel[..., 3:].reshape(bl, n_h, n_w_loc, k, c),
            mask5,
        )

    in_spec = P(batch_axis, None, ring_axis, None)
    out_spec5 = P(batch_axis, None, ring_axis, None, None)
    gx, gf, m = jax.shard_map(
        local, mesh=mesh, in_specs=(in_spec, in_spec),
        out_specs=(out_spec5, out_spec5, out_spec5),
    )(xyz, feats)
    n = n_h * n_w
    return (
        gx.reshape(b, n, k, 3),
        gf.reshape(b, n, k, c),
        m.reshape(b, n, k, 1),
    )
