"""Quaternion / SE(3) algebra as pure, batched JAX functions.

Capability parity with reference ``model_util.py:17-177`` (Hamilton products,
inverse, quat<->matrix<->euler conversions) and the numpy twin in
``main.py:401-434``, but written once as vectorized functions usable under
``jit``/``vmap``/``grad`` — no per-batch Python loops.

Quaternion layout is ``(w, x, y, z)`` (scalar first), matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b over the last axis (shape ``(..., 4)``).

    Broadcasts over leading axes, covering both reference variants
    ``mul_q_point`` (a is (B,1,4), b is (B,N,4)) and ``mul_point_q``.
    """
    aw, ax, ay, az = jnp.split(a, 4, axis=-1)
    bw, bx, by, bz = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse q* / |q|^2 (reference ``inv_q``, model_util.py:61-69)."""
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True) + _EPS
    conj = jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
    return conj / norm_sq


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize with the reference's double-epsilon guard
    (pwclo_model.py:203,427-430)."""
    n = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + _EPS) + _EPS
    return q / n


def qrotate(q: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``points`` (..., N, 3) by quaternion ``q`` (..., 4): q p q^-1.

    Matches the warp in reference pwclo_model.py:225-227 (mul_q_point then
    mul_point_q with inv_q).
    """
    q = q[..., None, :]  # (..., 1, 4)
    p4 = jnp.concatenate([jnp.zeros_like(points[..., :1]), points], axis=-1)
    rotated = qmul(qmul(q, p4), qinv(q))
    return rotated[..., 1:]


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) -> rotation matrix (..., 3, 3).

    Same non-unit-safe algorithm as reference ``quatt2T``
    (model_util.py:72-110) / ``quat2mat`` (main.py:401-434).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    nq = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(nq, 1e-8)
    X, Y, Z = x * s, y * s, z * s
    wX, wY, wZ = w * X, w * Y, w * Z
    xX, xY, xZ = x * X, x * Y, x * Z
    yY, yZ, zZ = y * Y, y * Z, z * Z
    row0 = jnp.stack([1.0 - (yY + zZ), xY - wZ, xZ + wY], axis=-1)
    row1 = jnp.stack([xY + wZ, 1.0 - (xX + zZ), yZ - wX], axis=-1)
    row2 = jnp.stack([xZ - wY, yZ + wX, 1.0 - (xX + yY)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_euler_zyx(m: jnp.ndarray):
    """Rotation matrix (..., 3, 3) -> (z, y, x) Euler angles.

    Mirrors the TF graph version (model_util.py:130-142), which uses the
    standard-form branch unconditionally.
    """
    r11, r12, r13 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    r23, r33 = m[..., 1, 2], m[..., 2, 2]
    cy = jnp.sqrt(r33 * r33 + r23 * r23)
    z = jnp.arctan2(-r12, r11)
    y = jnp.arctan2(r13, cy)
    x = jnp.arctan2(-r23, r33)
    return z, y, x


def euler_zyx_to_quat(z: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Euler (z then y then x) -> quaternion (..., 4).

    Matches reference ``euler2quat`` (model_util.py:112-127).
    """
    z, y, x = z / 2.0, y / 2.0, x / 2.0
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    return jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            cx * sy * sz + cy * cz * sx,
            cx * cz * sy - sx * cy * sz,
            cx * cy * sz + sx * cz * sy,
        ],
        axis=-1,
    )


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion via the zyx-euler path, exactly as the
    reference converts GT rotations (model_util.py:425-426)."""
    return euler_zyx_to_quat(*mat_to_euler_zyx(m))


def quat_trans_to_mat4(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(q (...,4), t (...,3)) -> homogeneous transform (..., 4, 4)."""
    r = quat_to_mat(q)
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose_pose(q_det: jnp.ndarray, t_det: jnp.ndarray, q_coarse: jnp.ndarray, t_coarse: jnp.ndarray):
    """Residual pose composition of the warp-refinement loop.

    q <- q_det ⊗ q_coarse;  t <- R(q_det) t_coarse + t_det
    (reference pwclo_model.py:275-280, using quaternion conjugation for the
    rotation of t_coarse).
    All arguments (..., 4) / (..., 3).
    """
    t4 = jnp.concatenate([jnp.zeros_like(t_coarse[..., :1]), t_coarse], axis=-1)
    t_rot = qmul(qmul(q_det, t4), qinv(q_det))[..., 1:]
    q_new = qmul(q_det, q_coarse)
    t_new = t_rot + t_det
    return q_new, t_new


def transform_points(mat4: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous transform (..., 4, 4) to points (..., N, 3)."""
    r = mat4[..., :3, :3]
    t = mat4[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", r, points) + t[..., None, :]
