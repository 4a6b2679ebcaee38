"""SE(3) manifold operations: Exp/Log maps, batched and autodiff-friendly.

No reference counterpart — the reference stops at frame-to-frame odometry
(SURVEY.md C23/§5).  These primitives power the beyond-reference pose-graph /
windowed-BA backend (BASELINE.json north_star), written as pure JAX so factor
Jacobians come from ``jax.jacfwd`` instead of hand-derived formulas.

Numerics: every trig ratio is computed with a "safe" angle
(``sqrt(theta_sq + tiny)``) plus a Taylor branch selected by ``where`` so that
values AND gradients stay finite at the identity — ``jacfwd`` at a zero twist
is the common case when linearizing factors.  ``so3_log`` recovers the angle
from ``atan2(|skew|, trace-1)``, which has clean gradients at theta = 0
(the ``arccos`` form does not).  The theta = pi neighborhood remains genuinely
singular (irrelevant for inter-keyframe motit ions).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-8   # theta_sq threshold for the Taylor branch
_TINY = 1e-24   # additive guard inside sqrt


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _trig_coeffs(theta_sq):
    """(a, b, c) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) with safe grads.

    theta_sq: (...,) squared angle.  Returns (..., 1, 1)-broadcastable
    scalars.
    """
    t_sq = theta_sq[..., None, None]
    t = jnp.sqrt(t_sq + _TINY)
    small = t_sq < _SMALL
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    a = jnp.where(small, 1.0 - t_sq / 6.0, sin_t / t)
    b = jnp.where(small, 0.5 - t_sq / 24.0, (1.0 - cos_t) / (t_sq + _TINY))
    c = jnp.where(small, 1.0 / 6.0 - t_sq / 120.0, (t - sin_t) / (t_sq * t + _TINY))
    return a, b, c


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) rotation vector -> (..., 3, 3) rotation matrix (Rodrigues)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _trig_coeffs(theta_sq)
    k = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a * k + b * (k @ k)


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector."""
    w_hat = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )  # = 2 sin(theta) * axis
    s_sq = jnp.sum(w_hat * w_hat, axis=-1)          # 4 sin^2(theta)
    s = jnp.sqrt(s_sq + _TINY)                      # 2 sin(theta), safe
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    theta = jnp.arctan2(s, trace - 1.0)             # clean grads at theta=0
    small = s_sq < _SMALL
    # w = theta / (2 sin theta) * w_hat;  series: 0.5 + theta^2/12,
    # with theta^2 ~ s_sq/4 near zero
    scale = jnp.where(small, 0.5 + s_sq / 48.0, theta / s)
    return scale[..., None] * w_hat


def _so3_log_theta_sq(r):
    w = so3_log(r)
    return w, jnp.sum(w * w, axis=-1)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist (v, w) -> (..., 4, 4) transform."""
    v, w = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, c = _trig_coeffs(theta_sq)
    k = hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    r = eye + a * k + b * k2
    j = eye + b * k + c * k2  # left Jacobian
    t = (j @ v[..., None])[..., 0]
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) transform -> (..., 6) twist (v, w)."""
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    w, theta_sq = _so3_log_theta_sq(r)
    k = hat(w)
    k2 = k @ k
    t_sq = theta_sq[..., None, None]
    th = jnp.sqrt(t_sq + _TINY)
    small = t_sq < _SMALL
    # J^-1 = I - K/2 + coef K^2,
    # coef = (1 - theta cos(theta/2) / (2 sin(theta/2))) / theta^2
    half = th / 2.0
    coef = jnp.where(
        small,
        1.0 / 12.0 + t_sq / 720.0,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + _TINY)) / (t_sq + _TINY),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), k.shape)
    j_inv = eye - 0.5 * k + coef * k2
    v = (j_inv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def se3_inv(m: jnp.ndarray) -> jnp.ndarray:
    r = m[..., :3, :3]
    t = m[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -(rt @ t[..., None])[..., 0]
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
