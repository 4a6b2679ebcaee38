"""Pallas TPU kernel: fused windowed neighbor selection (all stride cases).

Direct TPU-native counterpart of the reference CUDA kernels
(tf_ops/2d_conv_{random,select}_k/fused_conv_g.cu): for every center, scan a
static (kh, kw) window (cylindrical W wrap, zero-padded H), score candidates
(validity + radius test), and keep the best K — first-K in scan order
("first_k" / fused_conv_random_k) or K nearest ("knn" / fused_conv_select_k).

Covers every reference call geometry (fused_conv_g.cu:79-97):
* stride-1 same grid               (cost-volume stages),
* strided centers, same grid       (down_conv),
* dense centers, strided source    (up_conv).

Kernel design (one fused pass, nothing but the outputs in HBM):
* outside the kernel, the padded source is rearranged once (cheap, exact
  XLA slicing) into ``(B, 3, kh, P, n_h, Wc)`` so that the slab needed for
  window offset (dh, dw) at the program's center rows is
  ``ref[0, c, dh, phase(dw), :, col0(dw) : col0(dw)+n_w]`` — ``dh`` lands on
  a non-tiled dimension (a dynamic *sublane* slice would need an 8-aligned
  start, and a dynamic *lane* slice does not exist on the VPU), and the
  column slice is static per unrolled ``dw``;
* a streaming replace-the-worst top-K (VMEM scratch (K, TILE_H, n_w)) keeps
  the best scores/slots; the selected K set matches the XLA formulation
  exactly (order within the K slots unspecified — every consumer pools or
  attends over K, so order is immaterial; masks/sets are identical).

Benchmarked on one v5e against the XLA im2col formulation: 1.1-9x faster per
call site, with ~100x faster compiles than the roll-based variant.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import FIRST_K, KNN

_VALID_EPS = 1e-10
_NEG = -3.0e38


def _kernel(pos_ref, xyz1_ref, src_ref, top_ref, mask_ref,
            score_scr, slot_scr, *, kh, kw, k, distance, mode, tile_h, n_w,
            dw_phase, dw_col0):
    t_total = kh * kw

    cx = xyz1_ref[0, 0]                       # (TILE_H, n_w)
    cy = xyz1_ref[0, 1]
    cz = xyz1_ref[0, 2]
    center_valid = cx * cx + cy * cy + cz * cz > _VALID_EPS

    score_scr[...] = jnp.full((k, tile_h, n_w), _NEG, dtype=jnp.float32)
    slot_scr[...] = jnp.zeros((k, tile_h, n_w), dtype=jnp.int32)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, tile_h, n_w), 0)

    def row_body(dh, _):
        for dw in range(kw):
            p, c0 = dw_phase[dw], dw_col0[dw]
            ax = src_ref[0, 0, dh, p, :, c0 : c0 + n_w]
            ay = src_ref[0, 1, dh, p, :, c0 : c0 + n_w]
            az = src_ref[0, 2, dh, p, :, c0 : c0 + n_w]
            s_sq = ax * ax + ay * ay + az * az
            dx, dy, dz = ax - cx, ay - cy, az - cz
            d_sq = jnp.maximum(dx * dx + dy * dy + dz * dz, _VALID_EPS)
            ok = (
                (s_sq > _VALID_EPS)
                & (d_sq <= distance * distance)
                & center_valid
            )
            t = dh * kw + dw
            if mode == FIRST_K:
                pos = pos_ref[t].astype(jnp.float32)
                score = jnp.where(ok, t_total - pos, _NEG)
            else:
                score = jnp.where(ok, -d_sq, _NEG)

            best = score_scr[...]                       # (K, TILE_H, n_w)
            worst = jnp.min(best, axis=0)
            worst_k = jnp.argmin(best, axis=0)
            sel = (score > worst)[None] & (iota_k == worst_k[None])
            score_scr[...] = jnp.where(sel, score[None], best)
            slot_scr[...] = jnp.where(sel, t, slot_scr[...])
        return 0

    jax.lax.fori_loop(0, kh, row_body, 0)

    top_ref[0] = slot_scr[...]
    mask_ref[0] = (score_scr[...] > _NEG).astype(jnp.float32)


def _emit_kernel(slot_ref, src_ref, val_ref,
                 *, kh, kw, cg, tile_h, n_w, dw_phase, dw_col0):
    """Value emission for the grouped (down_conv) path.

    Re-streams the window and writes each candidate's channels into the
    slots that selected it — O(T*K*C) VMEM vector ops instead of a K-wide
    random gather from the dense grid (the dominant down_conv cost).
    Channel groups ride the grid so the source block stays inside VMEM at
    full resolution.
    """
    slot = slot_ref[0]  # (K, TILE_H, n_w)
    for c in range(cg):
        val_ref[0, c] = jnp.zeros(slot.shape, dtype=jnp.float32)

    def row_body(dh, _):
        for dw in range(kw):
            p, c0 = dw_phase[dw], dw_col0[dw]
            t = dh * kw + dw
            match = slot == t
            for c in range(cg):
                slab = src_ref[0, c, dh, p, :, c0 : c0 + n_w]
                val_ref[0, c] = jnp.where(match, slab[None], val_ref[0, c])
        return 0

    jax.lax.fori_loop(0, kh, row_body, 0)


def _prebuild(xyz2, kernel_size, center_stride, source_stride, out_hw):
    """Rearrange the padded source into (B, C, kh, P, n_h, Wc) plus the
    per-dw (phase, col0) tables — pure slicing, exact."""
    b, h2, w2, n_ch = xyz2.shape
    kh, kw = kernel_size
    csh, csw = center_stride
    sh, sw = source_stride
    n_h, n_w = out_hw
    ph, pw = kh // 2, kw // 2

    # wrap-pad W, zero-pad H; channels-first
    wrap_cols = np.mod(np.arange(-pw, w2 + (kw - 1 - pw)), w2)
    x = jnp.take(xyz2, jnp.asarray(wrap_cols), axis=2)
    x = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (0, 0), (0, 0)))
    x = jnp.moveaxis(x, -1, 1)  # (B, 3, Hp, Wp)
    wp = x.shape[-1]

    if sw > 1:
        # dense-repeat columns: y[j + sw*dw] == x[j//sw + dw]
        x = jnp.repeat(x, sw, axis=-1)
        wp = wp * sw
        p_count = 1
        dw_phase = [0] * kw
        dw_col0 = [sw * dw for dw in range(kw)]
        wc = wp
    elif csw > 1:
        # phase decomposition: column j*csw + dw == phase dw%csw, col dw//csw + j
        pad_to = -(-wp // csw) * csw
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_to - wp)))
        wc = pad_to // csw
        x = x.reshape(b, n_ch, x.shape[2], wc, csw)
        x = jnp.moveaxis(x, -1, 2)  # (B, 3, csw, Hp, Wc)
        p_count = csw
        dw_phase = [dw % csw for dw in range(kw)]
        dw_col0 = [dw // csw for dw in range(kw)]
    else:
        p_count = 1
        dw_phase = [0] * kw
        dw_col0 = list(range(kw))
        wc = wp

    # rows: per dh, the rows serving center rows [0, n_h)
    if csw > 1:
        # x is (B, 3, P, Hp, Wc); slice rows after the phase axis
        def row_slice(dh):
            return x[:, :, :, dh : dh + n_h * csh : csh, :][:, :, :, :n_h]
        stacked = jnp.stack([row_slice(dh) for dh in range(kh)], axis=2)
        # (B, 3, kh, P, n_h, Wc)
    else:
        if sh > 1:
            def row_slice(dh):
                r = x[:, :, dh : dh + h2, :]
                return jnp.repeat(r, sh, axis=2)[:, :, :n_h]
        elif csh > 1:
            def row_slice(dh):
                return x[:, :, dh : dh + n_h * csh : csh, :][:, :, :n_h]
        else:
            def row_slice(dh):
                return x[:, :, dh : dh + n_h, :]
        stacked = jnp.stack([row_slice(dh) for dh in range(kh)], axis=2)
        stacked = stacked[:, :, :, None]  # (B, 3, kh, 1, n_h, Wc)

    return stacked, tuple(dw_phase), tuple(dw_col0), wc


def _pick_tile_h(n_h, tile_h):
    """Mosaic: sublane block dim must be a multiple of 8 or the whole axis."""
    if n_h % 8 == 0:
        tile_h = max(8, min(tile_h - tile_h % 8, n_h))
        while n_h % tile_h:
            tile_h -= 8
        return tile_h
    return n_h


def _run_select(pos, centers, src, *, kh, kw, k, distance, mode, tile_h,
                n_h, n_w, wc, p_count, dw_phase, dw_col0, interpret):
    b = centers.shape[0]
    grid = (b, n_h // tile_h)
    kernel = partial(
        _kernel, kh=kh, kw=kw, k=k, distance=float(distance), mode=mode,
        tile_h=tile_h, n_w=n_w, dw_phase=dw_phase, dw_col0=dw_col0,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 3, tile_h, n_w), lambda bi, i, _p: (bi, 0, i, 0),
                ),
                # channel block 0:3 — a larger prebuilt (xyz ++ feats) tensor
                # feeds only its coordinate channels to the selection
                pl.BlockSpec(
                    (1, 3, kh, p_count, tile_h, wc),
                    lambda bi, i, _p: (bi, 0, 0, 0, i, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, k, tile_h, n_w), lambda bi, i, _p: (bi, 0, i, 0)),
                pl.BlockSpec((1, k, tile_h, n_w), lambda bi, i, _p: (bi, 0, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((k, tile_h, n_w), jnp.float32),
                pltpu.VMEM((k, tile_h, n_w), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, k, n_h, n_w), jnp.int32),
            jax.ShapeDtypeStruct((b, k, n_h, n_w), jnp.float32),
        ],
        interpret=interpret,
    )(pos, centers, src)


@partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "k", "distance", "center_stride", "source_stride",
        "mode", "tile_h", "interpret",
    ),
)
def pallas_window_select(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    center_stride: Tuple[int, int] = (1, 1),
    source_stride: Tuple[int, int] = (1, 1),
    mode: str = KNN,
    perm: Optional[jnp.ndarray] = None,
    tile_h: int = 8,
    interpret: bool = False,
):
    """Windowed selection for all reference call geometries.

    Returns (idx (B, N, K) int32 flat into H2*W2, mask (B, N, K, 1)) with the
    same set semantics as ``neighbors.select_neighbors`` (order within the K
    slots unspecified).
    """
    # the selection op is non-differentiable (indices + mask; the reference
    # CUDA ops had no gradient either) — cut tangents before the pallas_call
    # so jax.grad never asks for its JVP
    xyz1 = jax.lax.stop_gradient(xyz1)
    xyz2 = jax.lax.stop_gradient(xyz2)

    b, h1, w1, _ = xyz1.shape
    _, h2, w2, _ = xyz2.shape
    kh, kw = kernel_size
    t = kh * kw
    csh, csw = center_stride
    sh, sw = source_stride
    assert center_stride == (1, 1) or source_stride == (1, 1)
    n_h = -(-h1 // csh)
    n_w = -(-w1 // csw)

    centers = jnp.moveaxis(xyz1[:, ::csh, ::csw], -1, 1)  # (B, 3, n_h, n_w)
    src, dw_phase, dw_col0, wc = _prebuild(
        xyz2, kernel_size, center_stride, source_stride, (n_h, n_w)
    )
    p_count = src.shape[3]

    if perm is not None:
        pos = jnp.argsort(perm).astype(jnp.int32)
    else:
        pos = jnp.arange(t, dtype=jnp.int32)

    tile_h = _pick_tile_h(n_h, tile_h)

    top_t, mask = _run_select(
        pos, centers, src, kh=kh, kw=kw, k=k, distance=distance, mode=mode,
        tile_h=tile_h, n_h=n_h, n_w=n_w, wc=wc, p_count=p_count,
        dw_phase=dw_phase, dw_col0=dw_col0, interpret=interpret,
    )

    # (B, K, n_h, n_w) -> (B, N, K); window slot -> flat grid-2 index
    n = n_h * n_w
    top_t = jnp.moveaxis(top_t, 1, -1).reshape(b, n, k)
    mask = jnp.moveaxis(mask, 1, -1).reshape(b, n, k)

    base_rows = (np.arange(0, n_h * csh, csh) // sh).astype(np.int32)
    base_cols = (np.arange(0, n_w * csw, csw) // sw).astype(np.int32)
    base_r = jnp.asarray(np.repeat(base_rows, n_w))
    base_c = jnp.asarray(np.tile(base_cols, n_h))
    dh = top_t // kw - kh // 2
    dw = top_t % kw - kw // 2
    rows = jnp.clip(base_r[None, :, None] + dh, 0, h2 - 1)
    cols = jnp.mod(base_c[None, :, None] + dw, w2)
    idx = jnp.where(mask > 0, rows * w2 + cols, 0).astype(jnp.int32)
    # indices/mask are non-differentiable (the CUDA ops had no gradient;
    # reference call sites stop_gradient the mask) — and the pallas_call
    # must never appear on a VJP path
    return idx, jax.lax.stop_gradient(mask[..., None])


@partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "k", "distance", "center_stride", "mode", "tile_h",
        "interpret",
    ),
)
def pallas_select_and_group(
    xyz: jnp.ndarray,
    feats: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    center_stride: Tuple[int, int] = (1, 1),
    mode: str = FIRST_K,
    perm: Optional[jnp.ndarray] = None,
    tile_h: int = 8,
    interpret: bool = False,
):
    """Fused select + neighbor grouping on a single grid (down_conv path).

    Returns (grouped_xyz (B,N,K,3), grouped_feat (B,N,K,C), mask (B,N,K,1)).
    Values are emitted by a second in-VMEM window pass matched against the
    selected slots — no K-wide random gather from the dense grid.
    Note: the emitted *values* are non-differentiable (stop_gradient'd
    inputs), matching the masked-gather semantics only under the reference's
    stop_gradient usage; use select + ``gather_by_index`` when value
    gradients w.r.t. the source image are required.
    """
    xyz = jax.lax.stop_gradient(xyz)
    feats = jax.lax.stop_gradient(feats)

    b, h1, w1, _ = xyz.shape
    kh, kw = kernel_size
    t = kh * kw
    csh, csw = center_stride
    n_h = -(-h1 // csh)
    n_w = -(-w1 // csw)
    c_feat = feats.shape[-1]
    c_total = 3 + c_feat

    centers = jnp.moveaxis(xyz[:, ::csh, ::csw], -1, 1)
    src_all = jnp.concatenate([xyz, feats], axis=-1)
    src, dw_phase, dw_col0, wc = _prebuild(
        src_all, kernel_size, center_stride, (1, 1), (n_h, n_w)
    )
    p_count = src.shape[3]

    if perm is not None:
        pos = jnp.argsort(perm).astype(jnp.int32)
    else:
        pos = jnp.arange(t, dtype=jnp.int32)

    tile_h = _pick_tile_h(n_h, tile_h)

    top_t, mask = _run_select(
        pos, centers, src, kh=kh, kw=kw, k=k, distance=distance, mode=mode,
        tile_h=tile_h, n_h=n_h, n_w=n_w, wc=wc, p_count=p_count,
        dw_phase=dw_phase, dw_col0=dw_col0, interpret=interpret,
    )

    # channel groups: keep the per-program source block within VMEM; pad the
    # channel axis up to a group multiple (padding channels emit zeros and
    # are sliced away)
    budget = 6 * 1024 * 1024
    cg = max(1, min(8, budget // max(kh * p_count * tile_h * wc * 4, 1)))
    c_padded = -(-c_total // cg) * cg
    if c_padded != c_total:
        src = jnp.pad(
            src, ((0, 0), (0, c_padded - c_total), (0, 0), (0, 0), (0, 0), (0, 0))
        )
    n_groups = c_padded // cg

    grid = (b, n_h // tile_h, n_groups)
    kernel = partial(
        _emit_kernel, kh=kh, kw=kw, cg=cg, tile_h=tile_h, n_w=n_w,
        dw_phase=dw_phase, dw_col0=dw_col0,
    )
    vals = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, tile_h, n_w), lambda bi, i, ci: (bi, 0, i, 0)),
            pl.BlockSpec(
                (1, cg, kh, p_count, tile_h, wc),
                lambda bi, i, ci: (bi, ci, 0, 0, i, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cg, k, tile_h, n_w), lambda bi, i, ci: (bi, ci, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_padded, k, n_h, n_w), jnp.float32),
        interpret=interpret,
    )(top_t, src)

    n = n_h * n_w
    mask_nk = jnp.moveaxis(mask, 1, -1).reshape(b, n, k)[..., None]
    vals = jnp.transpose(vals[:, :c_total], (0, 3, 4, 2, 1)).reshape(b, n, k, c_total)
    vals = vals * mask_nk
    mask_out = jax.lax.stop_gradient(mask_nk)
    return vals[..., :3], vals[..., 3:], mask_out
