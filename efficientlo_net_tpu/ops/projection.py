"""Cylindrical range-image projection, fully vectorized.

Capability parity with reference ``ProjectPC2SphericalRing``
(model_util.py:181-292), which loops over the batch in Python and resolves
pixel collisions by keeping the minimum-range point (tf.unique +
unsorted_segment_min + scatter_nd).  Here the whole batch is one vmapped
segment-min + gather — no Python loops, fixed static shapes, differentiable
w.r.t. point coordinates and features (gradients flow to the winning point,
matching the reference's mask-then-scatter formulation).

Collision ties (two points with bit-equal minimum range in one pixel) are
resolved to the lowest point index; the reference would sum the tied points
(a scatter_nd quirk), which we deliberately do not replicate.
Invalid points (``x==y==z==0``, i.e. padding or cropped points) never scatter;
empty pixels stay exactly (0,0,0), which downstream ops treat as invalid.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..config import SensorConfig


def pixel_coords(points: jnp.ndarray, height: int, width: int, sensor: SensorConfig):
    """Map points (..., 3) to (row, col, valid) on an (height, width) grid.

    Same formulas & truncation semantics as model_util.py:232-245:
      col = int((pi - atan2(y, x)) / az_res)          (truncation toward zero)
      row = H - int(asin(z/r) / v_res + v_offset)     (then clipped)
    The vertical intrinsics are those of the full-res sensor; matching the
    reference, the coarse in-network re-projections recompute resolution from
    the coarse grid size.
    """
    az_res = 2.0 * math.pi / width
    up = sensor.vertical_fov_up_deg * math.pi / 180.0
    down = sensor.vertical_fov_down_deg * math.pi / 180.0
    v_res = (up - down) / max(height - 1, 1)
    v_off = -down / v_res

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r_sq = x * x + y * y + z * z
    valid = r_sq > 1e-10
    r = jnp.sqrt(jnp.where(valid, r_sq, 1.0))

    col = ((math.pi - jnp.arctan2(y, x)) / az_res).astype(jnp.int32)
    beta = jnp.arcsin(jnp.clip(z / r, -1.0, 1.0))
    row = height - (beta / v_res + v_off).astype(jnp.int32)

    row = jnp.clip(row, 0, height - 1)
    col = jnp.clip(col, 0, width - 1)
    return row, col, valid, r


def _project_single_scatter(points, features, height, width, sensor):
    """segment-min formulation (reference-shaped; scatter-heavy on TPU)."""
    n = points.shape[0]
    row, col, valid, r = pixel_coords(points, height, width, sensor)
    num_pix = height * width
    # invalid points go to a sentinel segment that is sliced away
    pix = jnp.where(valid, row * width + col, num_pix)

    inf = jnp.asarray(jnp.inf, dtype=r.dtype)
    r_masked = jnp.where(valid, r, inf)
    min_r = jax.ops.segment_min(r_masked, pix, num_segments=num_pix + 1)
    is_min = valid & (r_masked <= min_r[pix])
    # lowest index among range-ties wins (deterministic)
    cand = jnp.where(is_min, jnp.arange(n, dtype=jnp.int32), n)
    winner = jax.ops.segment_min(cand, pix, num_segments=num_pix + 1)[:num_pix]
    has_point = winner < n
    safe = jnp.clip(winner, 0, n - 1)

    img = jnp.where(has_point[:, None], points[safe], 0.0)
    img = img.reshape(height, width, 3)
    if features is None:
        return img, img
    feat_img = jnp.where(has_point[:, None], features[safe], 0.0)
    feat_img = feat_img.reshape(height, width, features.shape[-1])
    return img, feat_img


def _project_single_sort(points, features, height, width, sensor):
    """Sort + binary-search formulation: no scatters at all.

    TPU scatters serialize badly; instead lexicographically sort points by
    (pixel, range) — ``jax.lax.sort`` with two keys — and look up each
    pixel's winner with a vectorized binary search (gathers only).  Winner =
    min-range point, ties to the lowest point index (sort is stable).
    """
    n = points.shape[0]
    row, col, valid, r = pixel_coords(points, height, width, sensor)
    num_pix = height * width
    pix = jnp.where(valid, row * width + col, num_pix).astype(jnp.int32)

    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    pix_s, _, idx_s = jax.lax.sort((pix, r, idx), num_keys=2)

    pos = jnp.searchsorted(pix_s, jnp.arange(num_pix, dtype=jnp.int32))
    pos = jnp.minimum(pos, n - 1)
    found = pix_s[pos] == jnp.arange(num_pix, dtype=jnp.int32)
    winner = idx_s[pos]

    img = jnp.where(found[:, None], points[winner], 0.0)
    img = img.reshape(height, width, 3)
    if features is None:
        return img, img
    feat_img = jnp.where(found[:, None], features[winner], 0.0)
    feat_img = feat_img.reshape(height, width, features.shape[-1])
    return img, feat_img


def _project_single_packed(points, features, height, width, sensor):
    """Single segment-min over a packed (quantized range, index) key.

    Packs a 13-bit range quantization (7.3 mm steps over 0-60 m) and the
    18-bit point index into one int32, so the winner per pixel falls out of
    ONE scatter-min instead of two — ~2x less scatter work than the exact
    two-pass method.  Within a quantization step the lowest index wins;
    points whose ranges differ by < 7.3 mm in the same pixel are the same
    surface, so odometry-level behavior is unchanged (the reference would
    scatter-ADD exact ties, a quirk we don't replicate either way).
    """
    n = points.shape[0]
    assert n < (1 << 18), "packed projection supports < 262144 points"
    row, col, valid, r = pixel_coords(points, height, width, sensor)
    num_pix = height * width
    pix = jnp.where(valid, row * width + col, num_pix)

    r_q = jnp.clip((r * (8191.0 / 60.0)).astype(jnp.int32), 0, 8191)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    key = jnp.where(valid, (r_q << 18) | idx, jnp.int32(2**31 - 1))

    win_key = jax.ops.segment_min(key, pix, num_segments=num_pix + 1)[:num_pix]
    has_point = win_key != 2**31 - 1
    winner = jnp.clip(win_key & ((1 << 18) - 1), 0, n - 1)

    img = jnp.where(has_point[:, None], points[winner], 0.0)
    img = img.reshape(height, width, 3)
    if features is None:
        return img, img
    feat_img = jnp.where(has_point[:, None], features[winner], 0.0)
    feat_img = feat_img.reshape(height, width, features.shape[-1])
    return img, feat_img


_METHODS = {
    "sort": _project_single_sort,
    "scatter": _project_single_scatter,
    "packed": _project_single_packed,
}


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def project_to_range_image(
    points, features, height, width, sensor: SensorConfig, method: str = "sort"
):
    """Batched projection: points (B, N, 3) [+ features (B, N, C)] ->
    range image (B, H, W, 3) [+ feature image (B, H, W, C)].

    Returns (xyz_image, feature_image); when ``features`` is None the feature
    image aliases the xyz image (reference model_util.py:289-292).
    ``method``: "sort" (exact, gather-only — the default for general callers),
    "scatter" (exact segment-min), or "packed" (fastest; 7.3 mm range
    quantization, 60 m clip, < 2^18 points — safe only inside the 35 m-cropped
    network path, which opts in explicitly).
    """
    fn = partial(_METHODS[method], height=height, width=width, sensor=sensor)
    if features is None:
        return jax.vmap(lambda p: fn(p, None))(points)
    return jax.vmap(fn)(points, features)
