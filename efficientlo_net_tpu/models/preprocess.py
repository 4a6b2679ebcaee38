"""Batched preprocessing: validity masking, 35 m crop, SE(3) augmentation of
one frame, and GT conversion to (q, t).

Vectorized equivalent of reference ``PreProcess`` (model_util.py:346-445),
which loops the batch in Python.  The reference draws the augmented-frame
choice with numpy *at graph-build time* (pwclo_model.py:59), freezing it per
batch slot; here it is an explicit per-sample input so the trainer can draw
it per step from a threaded PRNG.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import quaternion as Q


def preprocess(pc_f1, pc_f2, T_gt, T_trans, T_trans_inv, aug_frame, max_planar_radius=35.0):
    """Args:
      pc_f1, pc_f2: (B, N, 3) raw padded clouds (frame 1 = later frame).
      T_gt: (B, 4, 4) ground-truth relative transform (LiDAR frame).
      T_trans / T_trans_inv: (B, 4, 4) augmentation perturbation (identity at
        eval).
      aug_frame: (B,) int, 1 or 2 — which frame receives the perturbation.

    Returns (pc1_aug, pc2_aug, q_gt, t_gt) with invalid/cropped points at
    exactly (0,0,0).
    """
    valid1 = jnp.any(pc_f1 != 0.0, axis=-1)  # (B, N)
    valid2 = jnp.any(pc_f2 != 0.0, axis=-1)

    # 35 m planar crop (model_util.py:380-383 uses the xy norm only)
    keep1 = valid1 & (jnp.linalg.norm(pc_f1[..., :2], axis=-1) <= max_planar_radius)
    keep2 = valid2 & (jnp.linalg.norm(pc_f2[..., :2], axis=-1) <= max_planar_radius)

    pc1 = pc_f1 * keep1[..., None]
    pc2 = pc_f2 * keep2[..., None]

    pc1_t = Q.transform_points(T_trans, pc1) * keep1[..., None]
    pc2_t = Q.transform_points(T_trans, pc2) * keep2[..., None]

    aug1 = (aug_frame == 1)[:, None, None]
    pc1_aug = jnp.where(aug1, pc1_t, pc1)
    pc2_aug = jnp.where(aug1, pc2, pc2_t)

    q_gt, t_gt = gt_quat(T_gt, T_trans, T_trans_inv, aug_frame)
    return pc1_aug, pc2_aug, q_gt, t_gt


def gt_quat(T_gt, T_trans, T_trans_inv, aug_frame):
    """Augmentation-adjusted GT as (q_gt (B,4), t_gt (B,3)).

    GT adjustment per augmented frame (model_util.py:402,417), then
    R -> euler(zyx) -> quaternion exactly as the reference converts GT
    rotations (model_util.py:425-426).  Split out of ``preprocess`` so the
    host-projected training path (data/host_preprocess.py), which augments
    and projects point clouds on the CPU, can still derive GT on device from
    the exact same code.
    """
    aug1 = (aug_frame == 1)[:, None, None]
    T_gt_aug = jnp.where(
        aug1,
        jnp.matmul(T_gt, T_trans_inv),
        jnp.matmul(T_trans, T_gt),
    )
    q_gt = Q.mat_to_quat(T_gt_aug[:, :3, :3])
    t_gt = T_gt_aug[:, :3, 3]
    return q_gt, t_gt
