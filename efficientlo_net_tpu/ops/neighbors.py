"""Windowed neighbor selection over the ordered cylindrical range image.

TPU-native replacement for the reference's two custom CUDA ops:

* ``fused_conv_random_k`` (tf_ops/2d_conv_random_k/fused_conv_g.cu:13-156):
  scan a static (kh, kw) window around each center in a host-supplied random
  permutation order, keep the first K candidates that are (a) inside the
  vertical bounds, (b) valid (non-zero) source points, and (c) within a
  radius of the center.  Column indices wrap cylindrically.
* ``fused_conv_select_k`` (tf_ops/2d_conv_select_k/fused_conv_g.cu:11-209):
  same candidate rules, then a partial selection-sort emitting the K nearest
  (true windowed KNN).

Both return gather indices + a validity mask; gradients flow only through the
subsequent feature gather (the reference applies tf.stop_gradient to the mask
at every call site, pointnet_util.py:54-55,203-204).

Two implementations:

``impl="fast"`` (default) — roll-based, benchmarked 8-10x faster on TPU:
  windows are static rectangles on an ordered grid, so the candidate tensor
  is built from W-rolls (cylindrical wrap for free) + H-pad/slices + strided
  slice / repeat for cross-resolution mappings — zero gathers.  Selection is
  an iterative argmax (exact, ~12x faster than lax.top_k on TPU for small K),
  and the winners' flat indices are recovered with pure index arithmetic.

``impl="reference"`` — explicit index-arithmetic + gather + top_k; supports
  arbitrary (non-grid) centers and serves as the correctness oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

FIRST_K = "first_k"
KNN = "knn"

_VALID_EPS = 1e-10

_ON_TPU: Optional[bool] = None


def _on_tpu() -> bool:
    """True when the default JAX backend drives TPU hardware.

    ``jax.default_backend()`` reports the PJRT plugin name, which is not
    always the literal ``"tpu"``: tunnel plugins (e.g. ``"axon"``) drive a
    real TPU chip under a different name, and dispatching on the plugin name
    alone would silently route production traffic to the XLA fallback path.
    Known-software backends are rejected by name; anything else is probed via
    ``device_kind`` (e.g. ``"TPU v5 lite"``).  The probe touches the already-
    initialised backend only (cheap) and is cached for the process lifetime.
    """
    global _ON_TPU
    if _ON_TPU is None:
        backend = jax.default_backend()
        if backend == "tpu":
            _ON_TPU = True
        elif backend in ("cpu", "gpu", "cuda", "rocm", "metal"):
            _ON_TPU = False
        else:
            try:
                kind = jax.devices()[0].device_kind
            except Exception:  # pragma: no cover - backend init failure
                kind = ""
            _ON_TPU = "tpu" in kind.lower()
    return _ON_TPU


def window_offsets(kernel_h: int, kernel_w: int) -> np.ndarray:
    """(T, 2) window offsets in kernel raster order, matching the CUDA
    index arithmetic ``kernel_HW_idx / kernel_W - kernel_half_H`` etc.
    (fused_conv_g.cu:80-81)."""
    kh_half, kw_half = kernel_h // 2, kernel_w // 2
    idx = np.arange(kernel_h * kernel_w)
    return np.stack([idx // kernel_w - kh_half, idx % kernel_w - kw_half], axis=-1)


def grid_centers(height: int, width: int, stride_h: int = 1, stride_w: int = 1) -> np.ndarray:
    """(N, 2) static center coordinates: every (stride_h, stride_w)-th pixel
    in raster order (reference get_hw_idx / get_selected_idx)."""
    hh = np.arange(0, height, stride_h)
    ww = np.arange(0, width, stride_w)
    h_grid, w_grid = np.meshgrid(hh, ww, indexing="ij")
    return np.stack([h_grid.reshape(-1), w_grid.reshape(-1)], axis=-1).astype(np.int32)


# ---------------------------------------------------------------------------
# fast (roll-based) implementation
# ---------------------------------------------------------------------------

def window_candidates(
    src: jnp.ndarray,
    kernel_size: Tuple[int, int],
    center_stride: Tuple[int, int],
    source_stride: Tuple[int, int],
    out_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Build the (B, N, C, T) window-candidate tensor via im2col patches.

    For center (i, j) of the (n_h, n_w) output grid, candidate t = (dh, dw)
    is ``src[ci // sh + dh, (cj // sw + dw) % W2]`` with ``(ci, cj) =
    (i * csh, j * csw)`` — the CUDA arithmetic of fused_conv_g.cu:79-97.
    Implemented as one ``lax.conv_general_dilated_patches`` over a
    wrap-padded (cylindrical) W axis and zero-padded H axis; out-of-bound
    rows become zero vectors, i.e. invalid candidates, exactly the kernels'
    skip rule.  Patches collapse the whole construction into a single XLA op
    (the hand-rolled roll/slice chain compiled 20x slower on the remote TPU
    toolchain).

    Only one of center_stride / source_stride may exceed (1, 1) — true for
    every reference call site (down_conv strides centers; up_conv strides the
    source; cost_volume strides neither).
    """
    b, h2, w2, c = src.shape
    kh, kw = kernel_size
    csh, csw = center_stride
    sh, sw = source_stride
    n_h, n_w = out_hw
    ph = kh // 2
    pw = kw // 2

    # cylindrical wrap on W (static index take handles kw > W2 too)
    wrap_cols = np.mod(np.arange(-pw, w2 + (kw - 1 - pw)), w2)
    x = jnp.take(src, jnp.asarray(wrap_cols), axis=2)
    # zero-pad H
    x = jnp.pad(x, ((0, 0), (ph, kh - 1 - ph), (0, 0), (0, 0)))

    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=(csh, csw),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # the identity-filter conv must not round f32 values through the
        # MXU's bf16 inputs — coordinates feed radius tests downstream
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, oh, ow, C * kh * kw), feature order: (c, dh, dw) channel-major

    oh, ow = patches.shape[1], patches.shape[2]
    patches = patches.reshape(b, oh, ow, c, kh * kw)

    if sh > 1 or sw > 1:
        patches = jnp.repeat(patches, sh, axis=1)[:, :n_h]
        patches = jnp.repeat(patches, sw, axis=2)[:, :, :n_w]
    else:
        patches = patches[:, :n_h, :n_w]

    return patches.reshape(b, n_h * n_w, c, kh * kw)


def _iterative_top_k(scores: jnp.ndarray, k: int):
    """Exact top-k over the last axis via k argmax passes.

    ~12x faster than lax.top_k on TPU for small k; ties resolve to the lowest
    index (same as top_k / the oracle's scan order)."""
    s = scores
    iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, s.ndim - 1)
    idxs, vals = [], []
    neg = jnp.asarray(-jnp.inf, dtype=s.dtype)
    for _ in range(k):
        i = jnp.argmax(s, axis=-1)
        v = jnp.max(s, axis=-1)
        idxs.append(i)
        vals.append(v)
        s = jnp.where(iota == i[..., None], neg, s)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "k", "distance", "center_stride", "source_stride",
        "out_hw", "mode",
    ),
)
def _select_fast(
    xyz1, xyz2, perm,
    kernel_size, k, distance, center_stride, source_stride, out_hw, mode,
):
    b = xyz1.shape[0]
    _, h2, w2, _ = xyz2.shape
    kh, kw = kernel_size
    t = kh * kw
    n_h, n_w = out_hw
    n = n_h * n_w
    csh, csw = center_stride

    center_xyz = xyz1[:, ::csh, ::csw].reshape(b, n, 3)
    center_valid = jnp.sum(center_xyz * center_xyz, axis=-1) > _VALID_EPS

    cand = window_candidates(xyz2, kernel_size, center_stride, source_stride, out_hw)
    cand_valid = jnp.sum(cand * cand, axis=2) > _VALID_EPS  # (B, N, T)

    diff = cand - center_xyz[..., None]  # (B, N, 3, T)
    d_sq = jnp.maximum(jnp.sum(diff * diff, axis=2), _VALID_EPS)

    ok = cand_valid & (d_sq <= distance * distance) & center_valid[:, :, None]

    if mode == FIRST_K:
        # score = T - scan_position; with a permuted scan order the position
        # of window slot t is inv_perm[t]
        pos = jnp.arange(t, dtype=jnp.float32)
        if perm is not None:
            pos = jnp.argsort(perm).astype(jnp.float32)
        score = jnp.where(ok, t - pos, -1.0)
        threshold = 0.0
    elif mode == KNN:
        score = jnp.where(ok, -d_sq, -jnp.inf)
        threshold = -jnp.inf
    else:
        raise ValueError(f"unknown mode {mode!r}")

    top_scores, top_t = _iterative_top_k(score, k)  # (B, N, K)
    mask = top_scores > threshold

    # recover flat grid-2 indices from window slot ids by pure arithmetic
    sh, sw = source_stride
    base_rows = (np.arange(0, n_h * csh, csh) // sh).astype(np.int32)  # (n_h,)
    base_cols = (np.arange(0, n_w * csw, csw) // sw).astype(np.int32)  # (n_w,)
    base_r = jnp.asarray(np.repeat(base_rows, n_w))  # (N,)
    base_c = jnp.asarray(np.tile(base_cols, n_h))    # (N,)

    dh = top_t // kw - kh // 2
    dw = top_t % kw - kw // 2
    rows = jnp.clip(base_r[None, :, None] + dh, 0, h2 - 1)
    cols = jnp.mod(base_c[None, :, None] + dw, w2)
    idx = rows * w2 + cols
    idx = jnp.where(mask, idx, 0)
    return idx.astype(jnp.int32), mask[..., None].astype(xyz1.dtype)


# ---------------------------------------------------------------------------
# reference (gather-based) implementation — correctness oracle, arbitrary
# centers
# ---------------------------------------------------------------------------

def fill_empty_slots_with_first(idx, mask):
    """The CUDA ops' ``flag_copy=1`` mode: duplicate the first selected
    neighbor into every empty slot (fused_conv_g.cu:126-138,179-191), giving
    a full-K mask whenever at least one neighbor exists.  Unused by every
    reference call site (always ``flag_copy=0``, pointnet_util.py:51,108,
    199,274) but provided for semantic completeness."""
    has_any = mask[:, :, :1, :] > 0  # slot 0 filled iff any hit
    first = idx[:, :, :1]
    filled = jnp.where(mask[..., 0] > 0, idx, first)
    new_mask = jnp.where(
        has_any, jnp.ones_like(mask), mask
    )
    return jnp.where(has_any[..., 0], filled, idx), new_mask


@partial(jax.jit, static_argnames=("kernel_size", "k", "distance", "stride", "mode"))
def _select_reference(xyz1, xyz2, perm, centers_hw, kernel_size, k, distance, stride, mode):
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
    center_valid = jnp.sum(center_xyz * center_xyz, axis=-1) > _VALID_EPS

    cand_xyz = jnp.take(xyz2_flat, cand_flat.reshape(-1), axis=1)
    cand_xyz = cand_xyz.reshape(b, cand_flat.shape[0], t, 3)
    cand_valid = jnp.sum(cand_xyz * cand_xyz, axis=-1) > _VALID_EPS

    diff = cand_xyz - center_xyz[:, :, None, :]
    d_sq = jnp.maximum(jnp.sum(diff * diff, axis=-1), _VALID_EPS)

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

    top_scores, top_pos = jax.lax.top_k(score, k)
    mask = top_scores > threshold
    idx = jnp.take_along_axis(
        jnp.broadcast_to(cand_flat[None], (b,) + cand_flat.shape), top_pos, axis=-1
    )
    idx = jnp.where(mask, idx, 0)
    return idx.astype(jnp.int32), mask[..., None].astype(xyz1.dtype)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def select_neighbors(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    center_stride: Tuple[int, int] = (1, 1),
    source_stride: Tuple[int, int] = (1, 1),
    mode: str = KNN,
    perm: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to K window neighbors for every center of the strided grid.

    Args:
      xyz1: (B, H1, W1, 3) grid holding center coordinates; centers are its
        (center_stride)-strided pixels in raster order.
      xyz2: (B, H2, W2, 3) source grid searched for neighbors.
      kernel_size: (kh, kw) window on grid 2.
      k: neighbors per center.
      distance: radius bound in meters (CUDA ``distance`` attr).
      center_stride: stride selecting centers from grid 1 (down_conv path).
      source_stride: divisor mapping grid-1 coords to grid-2 windows
        (up_conv path, fused_conv_g.cu:80-81).
      mode: "first_k" (fused_conv_random_k) or "knn" (fused_conv_select_k).
      perm: optional (T,) scan-order permutation for first_k — the
        training-time stochasticity of the reference's tf.random_shuffle.
      impl: "fast" (roll-based) or "reference" (gather-based oracle).

    Returns:
      idx:  (B, N, K) int32 flat indices into grid 2 (H2*W2), 0 where masked.
      mask: (B, N, K, 1) 1.0 for real neighbors, 0.0 for empty slots.
    """
    if impl is None:
        import os

        impl = os.environ.get("ELO_NEIGHBOR_IMPL", "auto")
    if impl == "auto":
        # the fused Pallas kernel is the fastest path on TPU; the XLA
        # formulation serves CPU (tests) and remains the correctness oracle
        impl = "pallas" if _on_tpu() else "fast"
    if impl == "pallas":
        from .pallas_select import pallas_window_select

        return pallas_window_select(
            xyz1, xyz2, tuple(kernel_size), k, float(distance),
            center_stride=tuple(center_stride),
            source_stride=tuple(source_stride), mode=mode, perm=perm,
        )
    csh, csw = center_stride
    n_h = -(-xyz1.shape[1] // csh)
    n_w = -(-xyz1.shape[2] // csw)
    if impl == "fast":
        assert center_stride == (1, 1) or source_stride == (1, 1)
        return _select_fast(
            xyz1, xyz2, perm,
            kernel_size=tuple(kernel_size), k=k, distance=float(distance),
            center_stride=tuple(center_stride),
            source_stride=tuple(source_stride),
            out_hw=(n_h, n_w), mode=mode,
        )
    centers = jnp.asarray(grid_centers(xyz1.shape[1], xyz1.shape[2], csh, csw))
    return _select_reference(
        xyz1, xyz2, perm, centers,
        kernel_size=tuple(kernel_size), k=k, distance=float(distance),
        stride=tuple(source_stride), mode=mode,
    )


@partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "k", "distance", "center_stride", "out_hw", "mode",
    ),
)
def _select_and_group_impl(
    xyz, feats, perm, kernel_size, k, distance, center_stride, out_hw, mode,
):
    b = xyz.shape[0]
    kh, kw = kernel_size
    t = kh * kw
    n_h, n_w = out_hw
    n = n_h * n_w
    csh, csw = center_stride

    center_xyz = xyz[:, ::csh, ::csw].reshape(b, n, 3)
    center_valid = jnp.sum(center_xyz * center_xyz, axis=-1) > _VALID_EPS

    src = jnp.concatenate([xyz, feats], axis=-1)
    cand = window_candidates(src, kernel_size, center_stride, (1, 1), out_hw)
    cand_xyz = cand[:, :, :3, :]  # (B, N, 3, T)
    cand_valid = jnp.sum(cand_xyz * cand_xyz, axis=2) > _VALID_EPS

    diff = cand_xyz - center_xyz[..., None]
    d_sq = jnp.maximum(jnp.sum(diff * diff, axis=2), _VALID_EPS)
    ok = cand_valid & (d_sq <= distance * distance) & center_valid[:, :, None]

    if mode == FIRST_K:
        pos = jnp.arange(t, dtype=jnp.float32)
        if perm is not None:
            pos = jnp.argsort(perm).astype(jnp.float32)
        score = jnp.where(ok, t - pos, -1.0)
        threshold = 0.0
    else:
        score = jnp.where(ok, -d_sq, -jnp.inf)
        threshold = -jnp.inf

    top_scores, top_t = _iterative_top_k(score, k)  # (B, N, K)
    mask = (top_scores > threshold)[..., None].astype(xyz.dtype)  # (B,N,K,1)

    # gather with channel-contiguous layout: index count is B*N*K (not *C)
    cand_nc = jnp.swapaxes(cand, 2, 3)  # (B, N, T, C)
    sel = jnp.take_along_axis(cand_nc, top_t[..., None], axis=2)  # (B,N,K,C)
    sel = sel * mask
    return sel[..., :3], sel[..., 3:], mask


def select_and_group(
    xyz: jnp.ndarray,
    feats: jnp.ndarray,
    kernel_size: Tuple[int, int],
    k: int,
    distance: float,
    center_stride: Tuple[int, int] = (1, 1),
    mode: str = FIRST_K,
    perm: Optional[jnp.ndarray] = None,
    fused: bool = False,
):
    """Fused select + neighbor grouping on a single grid (down_conv path).

    Returns (grouped_xyz (B,N,K,3), grouped_feat (B,N,K,C), mask (B,N,K,1)).
    Selection semantics identical to ``select_neighbors``.

    ``fused=True`` (inference only) emits the grouped values inside the
    Pallas kernel — no K-wide gather, but the values carry no gradient.
    Training uses select + gather so feature gradients flow into the source
    image exactly like the reference's ``tf.gather_nd``.
    """
    import os as _os

    if (
        _on_tpu()
        and _os.environ.get("ELO_NEIGHBOR_IMPL", "auto") in ("auto", "pallas")
    ):
        from .pallas_select import pallas_select_and_group, pallas_window_select

        if fused:
            return pallas_select_and_group(
                xyz, feats, tuple(kernel_size), k, float(distance),
                center_stride=tuple(center_stride), mode=mode, perm=perm,
            )
        idx, mask = pallas_window_select(
            xyz, xyz, tuple(kernel_size), k, float(distance),
            center_stride=tuple(center_stride), mode=mode, perm=perm,
        )
        both = gather_by_index(jnp.concatenate([xyz, feats], axis=-1), idx)
        both = both * mask
        return both[..., :3], both[..., 3:], mask

    csh, csw = center_stride
    n_h = -(-xyz.shape[1] // csh)
    n_w = -(-xyz.shape[2] // csw)
    return _select_and_group_impl(
        xyz, feats, perm,
        kernel_size=tuple(kernel_size), k=k, distance=float(distance),
        center_stride=tuple(center_stride), out_hw=(n_h, n_w), mode=mode,
    )


def select_neighbors_at(
    xyz1, xyz2, centers_hw, kernel_size, k, distance,
    stride=(1, 1), mode=KNN, perm=None,
):
    """Oracle-style entry with arbitrary explicit centers (testing)."""
    centers = jnp.asarray(centers_hw, dtype=jnp.int32)
    return _select_reference(
        xyz1, xyz2, perm, centers,
        kernel_size=tuple(kernel_size), k=k, distance=float(distance),
        stride=tuple(stride), mode=mode,
    )


def gather_by_index(image: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features for selected neighbors.

    image: (B, H, W, C) or (B, H*W, C); idx: (B, N, K) flat indices.
    Returns (B, N, K, C).  Equivalent to the reference's ``tf.gather_nd`` on
    (b, h, w) triples (pointnet_util.py:203-204).
    """
    b = image.shape[0]
    c = image.shape[-1]
    flat = image.reshape(b, -1, c)
    n, k = idx.shape[1], idx.shape[2]
    out = jnp.take_along_axis(flat, idx.reshape(b, n * k, 1), axis=1)
    return out.reshape(b, n, k, c)
