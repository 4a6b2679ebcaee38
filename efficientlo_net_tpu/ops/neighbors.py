"""Windowed neighbor selection over the ordered cylindrical range image.

TPU-native replacement for the reference's two custom CUDA ops:

* ``fused_conv_random_k`` (tf_ops/2d_conv_random_k/fused_conv_g.cu:13-156):
  scan a static (kh, kw) window around each center in a host-supplied random
  permutation order, keep the first K candidates that are (a) inside the
  vertical bounds, (b) valid (non-zero) source points, and (c) within a radius
  of the center.  Column indices wrap cylindrically.
* ``fused_conv_select_k`` (tf_ops/2d_conv_select_k/fused_conv_g.cu:11-209):
  same candidate rules, then a partial selection-sort emitting the K nearest
  (true windowed KNN).

Both return gather indices + a validity mask; gradients flow only through the
subsequent feature gather (the reference applies tf.stop_gradient to the mask
at every call site, pointnet_util.py:54-55,203-204).

Design: because windows are *static* rectangles on an ordered grid, candidate
coordinates are pure index arithmetic — one gather of the source grid per
call, masked distances on the VPU, and a ``top_k`` per center:

* first-K-in-scan-order == top_k over score ``T - position`` on valid
  candidates (positions are unique, so ordering is exact);
* windowed KNN        == top_k over ``-distance²`` on valid candidates
  (ties broken by window position instead of the CUDA scan order —
  semantically immaterial).

A Pallas kernel variant lives in ``pallas_neighbors.py``; this module is the
portable XLA formulation and the correctness oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

FIRST_K = "first_k"
KNN = "knn"


def window_offsets(kernel_h: int, kernel_w: int) -> np.ndarray:
    """(T, 2) window offsets in kernel raster order, matching the CUDA
    index arithmetic ``kernel_HW_idx / kernel_W - kernel_half_H`` etc.
    (fused_conv_g.cu:80-81)."""
    kh_half, kw_half = kernel_h // 2, kernel_w // 2
    idx = np.arange(kernel_h * kernel_w)
    return np.stack([idx // kernel_w - kh_half, idx % kernel_w - kw_half], axis=-1)


def grid_centers(height: int, width: int, stride_h: int = 1, stride_w: int = 1) -> np.ndarray:
    """(N, 2) static center coordinates: every (stride_h, stride_w)-th pixel
    in raster order.  stride (1,1) reproduces ``get_hw_idx``
    (pointnet_util.py:23-30); larger strides reproduce ``get_selected_idx``
    (model_util.py:296-316)."""
    hh = np.arange(0, height, stride_h)
    ww = np.arange(0, width, stride_w)
    h_grid, w_grid = np.meshgrid(hh, ww, indexing="ij")
    return np.stack([h_grid.reshape(-1), w_grid.reshape(-1)], axis=-1).astype(np.int32)


@partial(jax.jit, static_argnames=("kernel_size", "k", "distance", "stride", "mode"))
def _select_impl(xyz1, xyz2, perm, centers_hw, kernel_size, k, distance, stride, mode):
    b, h1, w1, _ = xyz1.shape
    _, h2, w2, _ = xyz2.shape
    kh, kw = kernel_size
    t = kh * kw
    sh, sw = stride

    offs = jnp.asarray(window_offsets(kh, kw), dtype=jnp.int32)  # (T, 2)
    if perm is not None:
        offs = offs[perm]

    ch = centers_hw[:, 0] // sh  # (N,)
    cw = centers_hw[:, 1] // sw
    cand_h = ch[:, None] + offs[None, :, 0]  # (N, T)
    cand_w = jnp.mod(cw[:, None] + offs[None, :, 1], w2)  # cylindrical wrap
    in_bounds = (cand_h >= 0) & (cand_h < h2)
    cand_flat = jnp.clip(cand_h, 0, h2 - 1) * w2 + cand_w  # (N, T)

    xyz1_flat = xyz1.reshape(b, h1 * w1, 3)
    xyz2_flat = xyz2.reshape(b, h2 * w2, 3)

    center_flat = centers_hw[:, 0] * w1 + centers_hw[:, 1]  # (N,)
    center_xyz = xyz1_flat[:, center_flat]  # (B, N, 3)
    center_valid = jnp.sum(center_xyz * center_xyz, axis=-1) > 1e-10  # (B, N)

    cand_xyz = jnp.take(xyz2_flat, cand_flat.reshape(-1), axis=1)
    cand_xyz = cand_xyz.reshape(b, cand_flat.shape[0], t, 3)  # (B, N, T, 3)
    cand_valid = jnp.sum(cand_xyz * cand_xyz, axis=-1) > 1e-10  # (B, N, T)

    diff = cand_xyz - center_xyz[:, :, None, :]
    d_sq = jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-10)  # (B, N, T)

    ok = (
        in_bounds[None]
        & cand_valid
        & (d_sq <= distance * distance)
        & center_valid[:, :, None]
    )

    if mode == FIRST_K:
        pos = jnp.arange(t, dtype=jnp.float32)
        score = jnp.where(ok, t - pos, -1.0)
        threshold = 0.0
    elif mode == KNN:
        score = jnp.where(ok, -d_sq, -jnp.inf)
        threshold = -jnp.inf
    else:
        raise ValueError(f"unknown mode {mode!r}")

    top_scores, top_pos = jax.lax.top_k(score, k)  # (B, N, K)
    mask = top_scores > threshold
    idx = jnp.take_along_axis(
        jnp.broadcast_to(cand_flat[None], (b,) + cand_flat.shape), top_pos, axis=-1
    )
    idx = jnp.where(mask, idx, 0)
    return idx.astype(jnp.int32), mask[..., None].astype(xyz1.dtype)


def select_neighbors(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    centers_hw: np.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    stride: Tuple[int, int] = (1, 1),
    mode: str = KNN,
    perm: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to K neighbors for every center.

    Args:
      xyz1: (B, H1, W1, 3) grid holding the center coordinates.
      xyz2: (B, H2, W2, 3) source grid searched for neighbors.
      centers_hw: static (N, 2) int array of center pixel coords in grid 1.
      kernel_size: (kh, kw) window on grid 2.
      k: neighbors per center.
      distance: radius bound in meters (matches the CUDA ``distance`` attr).
      stride: (sh, sw) mapping from grid-1 coords to grid-2 window centers
        (integer division, fused_conv_g.cu:80-81).
      mode: ``"first_k"`` (fused_conv_random_k) or ``"knn"``
        (fused_conv_select_k).
      perm: optional (T,) permutation of the window scan order; supplies the
        training-time stochasticity of the reference's host-side
        ``tf.random_shuffle`` (pointnet_util.py:45,104,193).

    Returns:
      idx:  (B, N, K) int32 flat indices into grid 2 (H2*W2), 0 where masked.
      mask: (B, N, K, 1) 1.0 for real neighbors, 0.0 for empty slots.
    """
    centers = jnp.asarray(centers_hw, dtype=jnp.int32)
    return _select_impl(
        xyz1, xyz2, perm, centers,
        kernel_size=tuple(kernel_size), k=k, distance=float(distance),
        stride=tuple(stride), mode=mode,
    )


def gather_by_index(image: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features for selected neighbors.

    image: (B, H, W, C) or (B, H*W, C); idx: (B, N, K) flat indices.
    Returns (B, N, K, C).  Equivalent to the reference's ``tf.gather_nd`` on
    the (b, h, w) index triples (pointnet_util.py:203-204).
    """
    b = image.shape[0]
    c = image.shape[-1]
    flat = image.reshape(b, -1, c)
    n, k = idx.shape[1], idx.shape[2]
    out = jnp.take_along_axis(flat, idx.reshape(b, n * k, 1), axis=1)
    return out.reshape(b, n, k, c)
