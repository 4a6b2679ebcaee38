"""Per-sample SE(3) training augmentation (host-side numpy).

Parity with reference ``DataAugmentation`` (main.py:259-297): small random
roll/pitch, larger yaw, clipped Gaussian translation; applied to one randomly
chosen frame (the reference freezes the choice at graph-build time,
pwclo_model.py:59 — here it is drawn per sample per step).
"""

from __future__ import annotations

import numpy as np


def random_se3(rng: np.random.Generator) -> np.ndarray:
    anglex = np.clip(0.01 * rng.standard_normal(), -0.02, 0.02) * np.pi / 4.0
    angley = np.clip(0.01 * rng.standard_normal(), -0.02, 0.02) * np.pi / 4.0
    anglez = np.clip(0.05 * rng.standard_normal(), -0.1, 0.1) * np.pi / 4.0

    cx, sx = np.cos(anglex), np.sin(anglex)
    cy, sy = np.cos(angley), np.sin(angley)
    cz, sz = np.cos(anglez), np.sin(anglez)

    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    r = rx @ ry @ rz

    t = np.array(
        [
            np.clip(0.5 * rng.standard_normal(), -1.0, 1.0),
            np.clip(0.1 * rng.standard_normal(), -0.2, 0.2),
            np.clip(0.05 * rng.standard_normal(), -0.15, 0.15),
        ]
    )
    T = np.eye(4)
    T[:3, :3] = r
    T[:3, 3] = t
    return T.astype(np.float32)


_MIRROR4 = np.diag([1.0, -1.0, 1.0, 1.0]).astype(np.float32)


def mirror_batch(batch: dict, rng: np.random.Generator,
                 clouds: bool = True) -> dict:
    """Reflect ~half the samples across the x-z plane (y -> -y), conjugating
    the ground truth: ``T' = M T M`` (R' = M R M, t' = M t), which preserves
    the pair alignment invariant exactly (pc2' = R' pc1' + t').

    Driving data is left/right asymmetric per sequence (a loop drive turns
    one way for its entire length), which biases the learned yaw prior: the
    globally loss-optimal prediction on ambiguous straight segments is a
    slight turn toward the dataset's dominant direction (+0.05 deg/pair
    measured at convergence — ~57 deg of heading drift over an 1100-frame
    drive, docs/accuracy_diagnosis.json).  Reflection makes the yaw
    distribution exactly symmetric for any data.  The reference has no
    counterpart (main.py:259-297 perturbs but never reflects).

    With ``clouds=False`` the (B, N, 3) arrays are left untouched and the
    per-sample reflection sign is returned as ``batch["mirror_sign"]``
    instead — the host-projected loader path folds the reflection into the
    fused native crop+augment+project pass (native_io) and never copies the
    clouds in Python.  The RNG draw is identical in both modes, so the two
    pipelines see the same mirrored sample stream.
    """
    pc1, pc2, T_gt = batch["pc1"], batch["pc2"], batch["T_gt"]
    flip = rng.random(len(pc1)) < 0.5
    if not np.any(flip):
        return batch
    sign = np.where(flip, -1.0, 1.0).astype(pc1.dtype)
    T_gt = T_gt.copy()
    T_gt[flip] = _MIRROR4 @ T_gt[flip] @ _MIRROR4
    if not clouds:
        return dict(batch, T_gt=T_gt.astype(np.float32), mirror_sign=sign)
    pc1 = pc1.copy()
    pc2 = pc2.copy()
    pc1[..., 1] *= sign[:, None]
    pc2[..., 1] *= sign[:, None]
    return dict(batch, pc1=pc1, pc2=pc2, T_gt=T_gt.astype(np.float32))


def augmentation_batch(rng: np.random.Generator, batch_size: int, training: bool):
    """Returns (T_trans, T_trans_inv, aug_frame) arrays for a batch."""
    if not training:
        eye = np.tile(np.eye(4, dtype=np.float32), (batch_size, 1, 1))
        return eye, eye.copy(), np.ones((batch_size,), dtype=np.int32)
    T = np.stack([random_se3(rng) for _ in range(batch_size)])
    T_inv = np.linalg.inv(T).astype(np.float32)
    aug_frame = rng.integers(1, 3, size=batch_size).astype(np.int32)
    return T, T_inv, aug_frame
