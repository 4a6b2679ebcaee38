"""Pallas TPU kernel: fused windowed neighbor selection.

Direct TPU-native counterpart of the reference CUDA kernels
(tf_ops/2d_conv_{random,select}_k/fused_conv_g.cu): for every pixel of the
range image, scan a static (kh, kw) window (cylindrical W wrap, zero-padded
H), score candidates (validity + radius test), and keep the best K — first-K
in scan order ("first_k" / fused_conv_random_k) or K nearest ("knn" /
fused_conv_select_k).

Kernel design (one fused pass, nothing materialized in HBM):
* the source image is wrap/zero padded outside the kernel and fits VMEM
  whole (64x1800x3 f32 = 1.4 MB at full resolution, less at coarse levels);
* grid = (batch, row-tiles); each program holds a (TILE_H, W) tile of
  centers and streams the T window offsets with a ``fori_loop``, reading the
  shifted slab with a dynamic slice — the cylindrical wrap is free because
  of the W padding;
* a streaming replace-the-worst top-K (VMEM scratch (K, TILE_H, W)) keeps
  the best scores/slots; the selected K set equals the XLA formulation's
  (order within K is unspecified — every consumer pools or attends over K,
  so order is immaterial; masks/sets are bit-identical).

Scope: same-grid stride-1 selection (the cost-volume call sites, which carry
the largest windows: kernel2 up to 11x41).  The strided down/up_conv paths
use the im2col XLA formulation in ``neighbors.py``.
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


def _kernel(pos_ref, xyz1_ref, xyz2p_ref, top_ref, mask_ref,
            score_scr, slot_scr, *, kh, kw, k, distance, mode, tile_h, w):
    t_total = kh * kw

    center = xyz1_ref[0]                      # (TILE_H, W, 3)
    c_sq = jnp.sum(center * center, axis=-1)  # (TILE_H, W)
    center_valid = c_sq > _VALID_EPS

    score_scr[...] = jnp.full((k, tile_h, w), _NEG, dtype=jnp.float32)
    slot_scr[...] = jnp.zeros((k, tile_h, w), dtype=jnp.int32)

    i = pl.program_id(1)
    row0 = i * tile_h
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (k, tile_h, w), 0)

    # Outer loop over window rows (dynamic sublane slice is cheap); inner
    # static unroll over window columns — a *dynamic* lane-dimension slice is
    # what the VPU cannot do natively.
    def row_body(dh, _):
        rows = xyz2p_ref[0, pl.ds(row0 + dh, tile_h), :, :]  # (TILE_H, Wp, 3)
        for dw in range(kw):
            slab = rows[:, dw : dw + w, :]
            s_sq = jnp.sum(slab * slab, axis=-1)
            diff = slab - center
            d_sq = jnp.maximum(jnp.sum(diff * diff, axis=-1), _VALID_EPS)
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

            best = score_scr[...]                       # (K, TILE_H, W)
            worst = jnp.min(best, axis=0)               # (TILE_H, W)
            worst_k = jnp.argmin(best, axis=0)          # (TILE_H, W)
            sel = (score > worst)[None] & (iota_k == worst_k[None])
            score_scr[...] = jnp.where(sel, score[None], best)
            slot_scr[...] = jnp.where(sel, t, slot_scr[...])
        return 0

    jax.lax.fori_loop(0, kh, row_body, 0)

    for kk in range(k):
        top_ref[0, :, :, kk] = slot_scr[kk]
        mask_ref[0, :, :, kk] = (score_scr[kk] > _NEG).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("kernel_size", "k", "distance", "mode", "tile_h", "interpret"),
)
def pallas_window_select(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    mode: str = KNN,
    perm: Optional[jnp.ndarray] = None,
    tile_h: int = 4,
    interpret: bool = False,
):
    """Same-grid stride-1 window selection.

    Returns (idx (B, N, K) int32 flat into H*W, mask (B, N, K, 1)) with the
    same set semantics as ``neighbors.select_neighbors`` (order within the K
    slots unspecified).
    """
    b, h, w, _ = xyz1.shape
    kh, kw = kernel_size
    t = kh * kw
    ph, pw = kh // 2, kw // 2

    # wrap-pad W, zero-pad H (padding shifts the window origin to >= 0)
    wrap_cols = np.mod(np.arange(-pw, w + (kw - 1 - pw)), w)
    xyz2p = jnp.take(xyz2, jnp.asarray(wrap_cols), axis=2)
    xyz2p = jnp.pad(xyz2p, ((0, 0), (ph, kh - 1 - ph), (0, 0), (0, 0)))

    if perm is not None:
        pos = jnp.argsort(perm).astype(jnp.int32)
    else:
        pos = jnp.arange(t, dtype=jnp.int32)

    tile_h = min(tile_h, h)
    while h % tile_h:
        tile_h -= 1

    grid = (b, h // tile_h)
    kernel = partial(
        _kernel, kh=kh, kw=kw, k=k, distance=float(distance), mode=mode,
        tile_h=tile_h, w=w,
    )

    top_t, mask = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tile_h, w, 3), lambda bi, i, _p: (bi, i, 0, 0),
                ),
                pl.BlockSpec(
                    (1, h + kh - 1, w + kw - 1, 3), lambda bi, i, _p: (bi, 0, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_h, w, k), lambda bi, i, _p: (bi, i, 0, 0)),
                pl.BlockSpec((1, tile_h, w, k), lambda bi, i, _p: (bi, i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((k, tile_h, w), jnp.float32),
                pltpu.VMEM((k, tile_h, w), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, k), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w, k), jnp.float32),
        ],
        interpret=interpret,
    )(pos, xyz1, xyz2p)

    # window slot -> flat grid index (same arithmetic as neighbors._select_fast)
    n = h * w
    top_t = top_t.reshape(b, n, k)
    mask = mask.reshape(b, n, k)
    base_r = jnp.asarray(np.repeat(np.arange(h, dtype=np.int32), w))
    base_c = jnp.asarray(np.tile(np.arange(w, dtype=np.int32), h))
    dh = top_t // kw - ph
    dw = top_t % kw - pw
    rows = jnp.clip(base_r[None, :, None] + dh, 0, h - 1)
    cols = jnp.mod(base_c[None, :, None] + dw, w)
    idx = jnp.where(mask > 0, rows * w + cols, 0).astype(jnp.int32)
    return idx, mask[..., None]
