"""Host-side crop + augmentation + projection for the host-projected
training path.

The on-device range-image projection sits at the TPU's scatter-serialization
floor (~2 ms/cloud, docs/projection_perf.md) and accounts for ~30% of the
train step (2 clouds x 2.03 ms of 13.6 ms/frame, docs/perf_breakdown.json).
It carries no parameter gradients (training/step.py stops gradients on the
input projections, mirroring reference pwclo_model.py:66-67), so the whole
preprocess -> project front half of the step can run on the CPU inside the
loader's worker threads and overlap with device compute: the step then
consumes dense (B, H, W, 3) images and keeps the TensorCore on the network.

Numpy twin of ``models.preprocess.preprocess`` (validity mask, 35 m planar
crop, SE(3) perturbation of one frame — reference model_util.py:346-445)
followed by the native C++ projector (data/native_io.py; exact min-range /
lowest-index semantics, reference model_util.py:181-292).  GT stays as
matrices: the device step derives (q_gt, t_gt) via ``preprocess.gt_quat`` so
the quaternion math has a single implementation.

Note the semantic delta vs the on-device path: the device path projects with
``method="packed"`` (7.3 mm range-quantized collision ties); the host
projector resolves collisions exactly.  Points whose ranges differ by
< 7.3 mm in one pixel are the same physical surface, so both are valid
training distributions (tests/test_host_preprocess.py pins the host images
against the exact device method).
"""

from __future__ import annotations

import numpy as np

from ..config import SensorConfig
from . import native_io


def crop_and_augment(pc_f1, pc_f2, T_trans, aug_frame, max_planar_radius=35.0):
    """Numpy equivalent of the point-cloud half of ``preprocess``:
    validity mask, planar crop, perturbation applied to frame ``aug_frame``.

    Args are (B, N, 3) float32 clouds, (B, 4, 4) perturbations, (B,) ints.
    Returns (pc1_aug, pc2_aug) with invalid/cropped points at exactly (0,0,0).
    """
    valid1 = np.any(pc_f1 != 0.0, axis=-1)
    valid2 = np.any(pc_f2 != 0.0, axis=-1)
    keep1 = valid1 & (
        np.linalg.norm(pc_f1[..., :2], axis=-1) <= max_planar_radius
    )
    keep2 = valid2 & (
        np.linalg.norm(pc_f2[..., :2], axis=-1) <= max_planar_radius
    )
    pc1 = pc_f1 * keep1[..., None]
    pc2 = pc_f2 * keep2[..., None]

    rot = T_trans[:, :3, :3]
    trans = T_trans[:, :3, 3]
    # transform maps padded zeros to the translation; re-zero via the mask,
    # exactly like models/preprocess.py:39-40
    pc1_t = (np.einsum("bij,bnj->bni", rot, pc1) + trans[:, None, :]) * keep1[
        ..., None
    ]
    pc2_t = (np.einsum("bij,bnj->bni", rot, pc2) + trans[:, None, :]) * keep2[
        ..., None
    ]

    aug1 = (aug_frame == 1)[:, None, None]
    pc1_aug = np.where(aug1, pc1_t, pc1).astype(np.float32)
    pc2_aug = np.where(aug1, pc2, pc2_t).astype(np.float32)
    return pc1_aug, pc2_aug


def augment_project_batch(
    batch: dict,
    sensor: SensorConfig,
    num_threads: int = 2,
) -> dict:
    """Map a raw loader batch to a host-projected one.

    Input: the ``make_batch`` dict (pc1/pc2 raw padded clouds + GT and
    augmentation matrices).  Output replaces the clouds with dense projected
    range images ``p1``/``p2`` (B, H, W, 3); GT/augmentation fields pass
    through for the device-side ``gt_quat``.

    With the ABI-3 native library the whole crop -> perturb -> project
    chain runs as one fused streaming pass per cloud
    (``native_io.augment_project_batch_native``): the numpy twin's ~15
    (B, N, 3) temporaries per batch measured 560 ms on the 4-CPU loader
    host — 5x the projection itself — and bound the training input
    pipeline; fused, the same batch costs ~30 ms.
    """
    h, w = sensor.height, sensor.width
    # optional deferred y-reflection (mirror_batch(clouds=False)): the sign
    # applies to the clouds only — T_gt was already conjugated upstream
    sign = batch.get("mirror_sign")
    if native_io.fused_available():
        # aug_frame is 1 (perturb frame 1) or 2 (perturb frame 2) — the
        # reference's convention (model_util.py aug_frame in {1, 2});
        # crop_and_augment transforms pc2 exactly when aug_frame != 1
        aug = np.asarray(batch["aug_frame"])
        p1 = native_io.augment_project_batch_native(
            batch["pc1"], batch["T_trans"], aug == 1, h, w, sensor,
            ysign=sign, num_threads=2 * num_threads,
        )
        p2 = native_io.augment_project_batch_native(
            batch["pc2"], batch["T_trans"], aug != 1, h, w, sensor,
            ysign=sign, num_threads=2 * num_threads,
        )
        return {
            "p1": p1,
            "p2": p2,
            "T_gt": batch["T_gt"],
            "T_trans": batch["T_trans"],
            "T_trans_inv": batch["T_trans_inv"],
            "aug_frame": batch["aug_frame"],
        }
    pc1_raw, pc2_raw = batch["pc1"], batch["pc2"]
    if sign is not None:
        pc1_raw = pc1_raw.copy()
        pc2_raw = pc2_raw.copy()
        pc1_raw[..., 1] *= sign[:, None]
        pc2_raw[..., 1] *= sign[:, None]
    pc1, pc2 = crop_and_augment(
        pc1_raw, pc2_raw, batch["T_trans"], batch["aug_frame"],
        max_planar_radius=sensor.max_planar_radius,
    )
    p1 = native_io.project_batch(pc1, h, w, sensor, num_threads=num_threads)
    p2 = native_io.project_batch(pc2, h, w, sensor, num_threads=num_threads)
    return {
        "p1": p1,
        "p2": p2,
        "T_gt": batch["T_gt"],
        "T_trans": batch["T_trans"],
        "T_trans_inv": batch["T_trans_inv"],
        "aug_frame": batch["aug_frame"],
    }
