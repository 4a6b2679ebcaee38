"""Streaming odometry inference: one new scan per step.

In a live odometry system each incoming scan pairs with the *previous* one,
whose range image AND Siamese feature pyramid were already computed when it
arrived — so the steady-state cost per frame is one projection + ONE feature
tower + the correlation/refinement stages, not two of each.  (The
reference's static graph re-projects and re-encodes both frames every pair,
main.py:530 / pwclo_model.py:63-64,117-165, an artifact of its feed_dict
structure.)  Eval-mode pyramids are deterministic, so the cached pyramid is
bit-identical to recomputing it.

``OdometryStream`` keeps the previous frame's pyramid on device and emits
the relative pose (q, t) of each new frame w.r.t. the previous one.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

from ..config import ModelConfig
from ..ops.projection import project_to_range_image


class OdometryStream:
    """``host_projection=True`` projects each scan on the CPU via the native
    library (data/native_io.py) and ships the dense range image to the
    device instead of the raw points — the on-device scatter projection sits
    at the TPU's scatter-serialization floor (docs/projection_perf.md), so a
    deployment with spare host cores can hand that work to the host and keep
    the TensorCore on the network.  Falls back to device projection when the
    native library is unavailable."""

    def __init__(self, model, variables, cfg: ModelConfig,
                 host_projection: bool = False):
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
        def _pyramid(variables, proj):
            return model.apply(
                variables, proj, False, 0.99, False, method=model._pyramid
            )

        @jax.jit
        def _step(variables, pyr_new, pyr_prev):
            out = model.apply(
                variables, pyr_new, pyr_prev, training=False,
                method=model.forward_from_pyramids,
            )
            return out["q"][0], out["t"][0]

        @jax.jit
        def _warp_project(img, m):
            # rigidly move a range image's valid points by m, re-project.
            # Invalid (zero) pixels must stay at the origin or they would
            # all land at m's translation as a phantom point.
            import jax.numpy as jnp

            pts = img.reshape(img.shape[0], -1, 3)
            valid = jnp.any(pts != 0.0, axis=-1, keepdims=True)
            moved = pts @ m[:3, :3].T + m[:3, 3]
            return _project(jnp.where(valid, moved, 0.0))

        self._project = _project
        self._pyramid = _pyramid
        self._step = _step
        self._warp_project = _warp_project
        self._variables = variables
        self._prev = None
        #: (1, H, W, 3) range image of the most recent pushed scan — SLAM
        #: consumers attach it as the keyframe payload for scan factors
        self.last_projection = None
        if host_projection:
            from ..data import native_io

            self._host_project = (
                native_io.project_scan if native_io.available() else None
            )
        else:
            self._host_project = None

    def reset(self) -> None:
        self._prev = None

    def measure_relative(self, img_i, img_j, t_init=None, refinements: int = 2):
        """Measure i_T_j between two range images by iterated
        warp-and-measure — the loop-closure measurement primitive.

        The network is trained on consecutive-frame motion (~0.6-0.9 m);
        a revisit pair can sit meters apart, outside that regime.  So:
        measure once raw (or start from ``t_init``), then repeatedly warp
        frame j's points into frame i by the current estimate, re-project,
        and let the network measure the *residual* motion — which IS in its
        trained regime.  Each refinement composes ``i_T_j <- delta @ i_T_j``.

        img_i / img_j: (H, W, 3) or (1, H, W, 3) range images (e.g. SLAM
        keyframe payloads).  Returns a (4, 4) float64 i_T_j.
        """
        import jax.numpy as jnp

        from .odometry import quat_to_mat_np

        def to_batch(x):
            x = jnp.asarray(x)
            return x if x.ndim == 4 else x[None]

        def mat(q, t):
            q = np.asarray(q, dtype=np.float64).reshape(4)
            m = np.eye(4)
            m[:3, :3] = quat_to_mat_np(q / np.linalg.norm(q))
            m[:3, 3] = np.asarray(t, dtype=np.float64).reshape(3)
            return m

        img_i, img_j = to_batch(img_i), to_batch(img_j)
        pyr_i = self._pyramid(self._variables, img_i)
        if t_init is None:
            pyr_j = self._pyramid(self._variables, img_j)
            q, t = self._step(self._variables, pyr_j, pyr_i)
            cur = mat(q, t)
        else:
            cur = np.asarray(t_init, dtype=np.float64).copy()
        for _ in range(refinements):
            warped = self._warp_project(img_j, jnp.asarray(cur, dtype=jnp.float32))
            pyr_w = self._pyramid(self._variables, warped)
            q, t = self._step(self._variables, pyr_w, pyr_i)
            cur = mat(q, t) @ cur
        return cur

    def push(self, points: np.ndarray):
        """points: (N, 3) new scan.  Returns (q (4,), t (3,)) — the relative
        pose of this frame w.r.t. the previous frame (identity-ish for the
        first frame, which pairs with itself like reference
        kitti_dataset.py:45-49)."""
        import jax.numpy as jnp

        if self._host_project is not None:
            img = self._host_project(
                np.ascontiguousarray(points, dtype=np.float32),
                self.cfg.sensor.height, self.cfg.sensor.width,
                self.cfg.sensor,
                crop_radius=self.cfg.sensor.max_planar_radius,
            )
            proj = jnp.asarray(img[None])
        else:
            proj = self._project(jnp.asarray(points[None]))
        pyr = self._pyramid(self._variables, proj)
        prev = pyr if self._prev is None else self._prev
        q, t = self._step(self._variables, pyr, prev)
        self._prev = pyr
        self.last_projection = proj
        return np.asarray(q[0]), np.asarray(t[0])
