"""Streaming odometry inference: one new scan per step.

In a live odometry system each incoming scan pairs with the *previous* one,
whose range image is already computed — so the steady-state cost per frame is
one projection + one forward pass, not two projections.  (The reference's
graph re-projects both frames every pair, main.py:530 / pwclo_model.py:63-64,
an artifact of its feed_dict structure.)

``OdometryStream`` keeps the previous frame's projection on device and emits
the relative pose (q, t) of each new frame w.r.t. the previous one, plus the
accumulated trajectory if requested.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..config import ModelConfig
from ..ops.projection import project_to_range_image


class OdometryStream:
    def __init__(self, model, variables, cfg: ModelConfig):
        import jax

        self.cfg = cfg
        h, w = cfg.sensor.height, cfg.sensor.width

        @jax.jit
        def _project(points):
            # Match the training distribution: validity mask + planar crop
            # (models/preprocess.py; reference model_util.py:380-383) before
            # projecting.  The crop also makes the fast "packed" method safe.
            import jax.numpy as jnp

            valid = jnp.any(points != 0.0, axis=-1)
            keep = valid & (
                jnp.linalg.norm(points[..., :2], axis=-1)
                <= cfg.sensor.max_planar_radius
            )
            cropped = points * keep[..., None]
            img, _ = project_to_range_image(
                cropped, None, h, w, cfg.sensor, method="packed"
            )
            return img

        @jax.jit
        def _step(variables, proj_new, proj_prev):
            out = model.apply(variables, proj_new, proj_prev, training=False)
            return out["q"][0], out["t"][0]

        self._project = _project
        self._step = _step
        self._variables = variables
        self._prev = None

    def reset(self) -> None:
        self._prev = None

    def push(self, points: np.ndarray):
        """points: (N, 3) new scan.  Returns (q (4,), t (3,)) — the relative
        pose of this frame w.r.t. the previous frame (identity-ish for the
        first frame, which pairs with itself like reference
        kitti_dataset.py:45-49)."""
        import jax.numpy as jnp

        proj = self._project(jnp.asarray(points[None]))
        prev = proj if self._prev is None else self._prev
        q, t = self._step(self._variables, proj, prev)
        self._prev = proj
        return np.asarray(q[0]), np.asarray(t[0])
