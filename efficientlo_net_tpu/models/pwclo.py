"""PWCLO-Net: pyramid / warping / cost-volume LiDAR odometry network.

Capability parity with reference ``pwclo_model.py:30-433`` — a 4-level
Siamese set-conv pyramid over the cylindrical range image, a coarse attentive
cost volume regressing an initial quaternion+translation through an
embedding-mask head, and three pose warp-refinement levels — re-designed
TPU-first: one functional Flax module, fully batched (no Python loops over
the batch), static shapes at every level, explicit PRNG for the stochastic
neighbor scan order and dropout, BN momentum as a traced input.

Level bookkeeping (reference pwclo_model.py:42-50, full-res HDL-64 config):
  input/pre2 64x1800 -> l0 16x225 -> l1 8x113 -> l2 4x57 -> l3 4x29.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops import quaternion as Q
from ..ops.projection import project_to_range_image
from .layers import (
    CostVolume,
    DownConv,
    FlowPredictor,
    Head1x1,
    UpConv,
    softmax_valid,
    valid_mask_from_xyz,
)


class PoseHead(nn.Module):
    """conv1d(256) -> dropout -> {q head (normalized), t head}
    (reference pwclo_model.py:197-208 and per-level copies)."""

    head_dim: int
    dropout_rate: float

    @nn.compact
    def __call__(self, feat_b1c, training: bool):
        big = Head1x1(self.head_dim, name="big")(feat_b1c)
        x = nn.Dropout(self.dropout_rate, deterministic=not training)(big)
        q = Head1x1(4, name="q_head")(x)
        q = Q.qnormalize(q)
        t = Head1x1(3, name="t_head")(x)
        return q[:, 0, :], t[:, 0, :]  # (B, 4), (B, 3)


class PWCLONet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        shapes = cfg.level_shapes
        strides = list(zip(cfg.stride_h, cfg.stride_w))
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # Siamese pyramid: one module per level, applied to both frames
        # (weight sharing via scope.reuse_variables in the reference,
        # pwclo_model.py:117-165).
        self.down_layers = [
            DownConv(
                kernel_size=cfg.down_kernels[i],
                k=cfg.down_K[i],
                distance=cfg.down_conv_dis[i],
                mlp=cfg.down_mlps[i],
                out_hw=shapes[i + 2],
                dtype=dtype,
                name=f"down_l{i}",
            )
            for i in range(4)
        ]
        self.down_strides = [strides[i + 2] for i in range(4)]

        # Coarse correlation at l2 + pooling down_conv to l3
        # (pwclo_model.py:170-178).
        self.cv_origin = CostVolume(
            kernel_size1=cfg.cv_kernel1,
            kernel_size2=cfg.cv_kernel2[3],
            nsample=cfg.cv_nsample,
            nsample_q=cfg.cv_nsample_q[3],
            distance=cfg.cost_volume_dis[2],
            mlp1=cfg.cv_mlp1,
            mlp2=cfg.cv_mlp2,
            dtype=dtype,
            name="cv_origin",
        )
        self.cv_down = DownConv(
            kernel_size=cfg.down_kernels[3],
            k=cfg.down_K[3],
            distance=cfg.down_conv_dis[3],
            mlp=cfg.cv_down_mlp,
            out_hw=shapes[5],
            dtype=dtype,
            name="cv_down_l3",
        )

        self.l3_w_predictor = FlowPredictor(cfg.predictor_mlp, dtype=dtype, name="l3_w_predictor")
        self.l3_head = PoseHead(cfg.head_dim, cfg.dropout_rate, name="l3_head")

        # Warp-refinement levels l2, l1, l0 (pwclo_model.py:213-425).
        self.refine_cv = [
            CostVolume(
                kernel_size1=cfg.cv_kernel1,
                kernel_size2=cfg.cv_kernel2[i],
                nsample=cfg.cv_nsample,
                nsample_q=cfg.cv_nsample_q[i],
                distance=cfg.cost_volume_dis[i],
                mlp1=cfg.cv_mlp1,
                mlp2=cfg.cv_mlp2,
                dtype=dtype,
                name=f"cv_l{i}",
            )
            for i in range(3)
        ]
        # up_conv strides map level i to level i+1's grid: l2 uses the l3
        # transition stride, etc. (pwclo_model.py:247-251, 320-326, 394-398).
        self.refine_up_w = [
            UpConv(
                kernel_size=cfg.up_kernel,
                nsample=cfg.up_nsample,
                distance=cfg.up_conv_dis[i],
                stride_hw=strides[i + 3],
                mlp=cfg.up_mlp1,
                mlp2=cfg.up_mlp2,
                dtype=dtype,
                name=f"up_w_l{i}",
            )
            for i in range(3)
        ]
        self.refine_up_feat = [
            UpConv(
                kernel_size=cfg.up_kernel,
                nsample=cfg.up_nsample,
                distance=cfg.up_conv_dis[i],
                stride_hw=strides[i + 3],
                mlp=cfg.up_mlp1,
                mlp2=cfg.up_mlp2,
                dtype=dtype,
                name=f"up_feat_l{i}",
            )
            for i in range(3)
        ]
        self.refine_pred_feat = [
            FlowPredictor(cfg.predictor_mlp, dtype=dtype, name=f"pred_feat_l{i}")
            for i in range(3)
        ]
        self.refine_pred_w = [
            FlowPredictor(cfg.predictor_mlp, dtype=dtype, name=f"pred_w_l{i}")
            for i in range(3)
        ]
        self.refine_head = [
            PoseHead(cfg.head_dim, cfg.dropout_rate, name=f"head_l{i}") for i in range(3)
        ]

    # ------------------------------------------------------------------
    def _perm(self, kernel_size, stochastic: bool):
        """Scan-order permutation for first-K selection — the TPU equivalent
        of the per-call tf.random_shuffle (pointnet_util.py:45,104,193)."""
        t = kernel_size[0] * kernel_size[1]
        if not stochastic:
            return None
        return jax.random.permutation(self.make_rng("neighbor"), t)

    def _pyramid(self, xyz_proj, training, bn_momentum, stochastic,
                 ring_mesh=None):
        """Four down_convs for one frame; returns per-level (xyz_proj, feat,
        feat_proj).  With ``ring_mesh``, the full-resolution level-0 select
        (by far the heaviest: the 64x1800 grid) runs W-axis ring-sharded
        (parallel/ring.py); coarser levels are tiny and stay replicated."""
        cfg = self.cfg
        shapes = cfg.level_shapes
        feats = []
        cur_xyz = xyz_proj
        cur_feat_proj = jnp.zeros_like(xyz_proj)  # zero input features
        for i in range(4):
            perm = self._perm(cfg.down_kernels[i], stochastic)
            select_fn = None
            if ring_mesh is not None and i == 0:
                from functools import partial

                from ..parallel.ring import ring_select_and_group

                select_fn = partial(ring_select_and_group, mesh=ring_mesh)
            feat, new_xyz = self.down_layers[i](
                cur_xyz, cur_feat_proj, self.down_strides[i], training, bn_momentum,
                perm=perm, select_fn=select_fn,
            )
            h, w = shapes[i + 2]
            feat_proj = feat.reshape(feat.shape[0], h, w, feat.shape[-1])
            feats.append((new_xyz, feat, feat_proj))
            cur_xyz, cur_feat_proj = new_xyz, feat_proj
        return feats

    def _warp(self, xyz_proj, q, t):
        """Rigidly move level points by the accumulated pose, masking invalid
        points (pwclo_model.py:219-227)."""
        b, h, w, _ = xyz_proj.shape
        xyz = xyz_proj.reshape(b, h * w, 3)
        mask = valid_mask_from_xyz(xyz)[..., None]
        warped = (Q.qrotate(q, xyz) + t[:, None, :]) * mask
        return warped

    def __call__(
        self,
        proj_f1: jnp.ndarray,
        proj_f2: jnp.ndarray,
        training: bool = False,
        bn_momentum=0.99,
        stochastic: bool = False,
        ring_mesh=None,
    ) -> Dict[str, Any]:
        if not training:
            # Merged Siamese tower: one 2B-batch pyramid instead of two
            # B-batch ones.  The coarse-grid neighbor selects are
            # launch-bound, not work-bound (docs/perf_breakdown.json:
            # ~1.2 ms/dispatch floor at <4k centers, measured for BOTH the
            # Pallas and XLA formulations), so halving the number of select
            # dispatches saves ~4 launches/pair.  Eval-mode BN reads EMA
            # stats and every pyramid op is elementwise-independent across
            # the batch, so the merged tower is bit-identical to two
            # separate ones.  Training keeps separate towers: batch-stats
            # BN over a 2B batch would change the normalization statistics.
            b = proj_f1.shape[0]
            both = jnp.concatenate([proj_f1, proj_f2], axis=0)
            fb = self._pyramid(both, training, bn_momentum, stochastic,
                               ring_mesh=ring_mesh)
            f1 = [tuple(t[:b] for t in lvl) for lvl in fb]
            f2 = [tuple(t[b:] for t in lvl) for lvl in fb]
        else:
            f1 = self._pyramid(proj_f1, training, bn_momentum, stochastic,
                               ring_mesh=ring_mesh)
            f2 = self._pyramid(proj_f2, training, bn_momentum, stochastic,
                               ring_mesh=ring_mesh)
        return self.forward_from_pyramids(
            f1, f2, training, bn_momentum, stochastic
        )

    def forward_from_pyramids(
        self,
        f1,
        f2,
        training: bool = False,
        bn_momentum=0.99,
        stochastic: bool = False,
    ) -> Dict[str, Any]:
        """Correlation + warp-refinement on precomputed feature pyramids.

        Streaming deployments cache each frame's pyramid when it arrives and
        pair it with the next frame's (evaluation/streaming.py), so the
        steady-state cost is ONE tower per scan instead of the two the
        reference's static graph recomputes every pair (pwclo_model.py:117-165
        rebuilds both Siamese towers per feed).  Eval-mode pyramids are
        deterministic, so cached == recomputed exactly."""
        cfg = self.cfg
        shapes = cfg.level_shapes
        b = f1[0][0].shape[0]

        (l0_xyz1, l0_feat1, l0_fp1) = f1[0]
        (l1_xyz1, l1_feat1, l1_fp1) = f1[1]
        (l2_xyz1, l2_feat1, l2_fp1) = f1[2]
        (l3_xyz1, l3_feat1, l3_fp1) = f1[3]
        (l0_xyz2, _, l0_fp2) = f2[0]
        (l1_xyz2, _, l1_fp2) = f2[1]
        (l2_xyz2, _, l2_fp2) = f2[2]

        # ---- coarse level l3 -------------------------------------------
        cv = self.cv_origin(
            l2_xyz1, l2_xyz2, l2_fp1, l2_fp2, training, bn_momentum,
            perm=self._perm(cfg.cv_kernel1, stochastic),
        )
        h2, w2 = shapes[4]
        cv_proj = cv.reshape(b, h2, w2, cv.shape[-1])
        l3_cv_feat, _ = self.cv_down(
            l2_xyz1, cv_proj, self.down_strides[3], training, bn_momentum,
            perm=self._perm(cfg.down_kernels[3], stochastic),
        )  # (B, N3, C)

        h3, w3 = shapes[5]
        l3_predict = l3_cv_feat
        l3_predict_proj = l3_predict.reshape(b, h3, w3, -1)

        l3_w = self.l3_w_predictor([l3_feat1, l3_predict], training, bn_momentum)
        l3_w_proj = l3_w.reshape(b, h3, w3, -1)

        l3_xyz_flat = l3_xyz1.reshape(b, h3 * w3, 3)
        l3_mask = valid_mask_from_xyz(l3_xyz_flat)
        l3_pooled = softmax_valid(l3_predict, l3_w, l3_mask)
        l3_q, l3_t = self.l3_head(l3_pooled, training)

        # ---- warp-refinement l2 -> l1 -> l0 ----------------------------
        level_data = [
            # (idx in refine_*, xyz1_proj, feat1, fp2 of frame2, xyz2_proj, level shape)
            (2, l2_xyz1, l2_feat1, l2_fp2, l2_xyz2, shapes[4]),
            (1, l1_xyz1, l1_feat1, l1_fp2, l1_xyz2, shapes[3]),
            (0, l0_xyz1, l0_feat1, l0_fp2, l0_xyz2, shapes[2]),
        ]

        q_coarse, t_coarse = l3_q, l3_t
        coarser_xyz_proj = l3_xyz1          # source grid for up_convs
        coarser_w_proj = l3_w_proj
        coarser_predict_proj = l3_predict_proj

        qs, ts = [None, None, None, l3_q], [None, None, None, l3_t]

        for li, xyz1_proj, feat1, fp2, xyz2_proj, (hl, wl) in level_data:
            warped = self._warp(xyz1_proj, q_coarse, t_coarse)  # (B, N, 3)
            # warped points derive from the 35 m-cropped input -> "packed" safe
            xyz_warp_proj, feat_warp_proj = project_to_range_image(
                warped, feat1, hl, wl, cfg.sensor, method="packed"
            )
            feat_warp = feat_warp_proj.reshape(b, hl * wl, -1)
            mask_warp = valid_mask_from_xyz(xyz_warp_proj.reshape(b, hl * wl, 3))

            cv_l = self.refine_cv[li](
                xyz_warp_proj, xyz2_proj, feat_warp_proj, fp2, training, bn_momentum,
                perm=self._perm(cfg.cv_kernel1, stochastic),
            )
            up_w = self.refine_up_w[li](
                xyz_warp_proj, coarser_xyz_proj, feat_warp, coarser_w_proj,
                training, bn_momentum, perm=self._perm(cfg.up_kernel, stochastic),
            )
            up_feat = self.refine_up_feat[li](
                xyz_warp_proj, coarser_xyz_proj, feat_warp, coarser_predict_proj,
                training, bn_momentum, perm=self._perm(cfg.up_kernel, stochastic),
            )
            predict = self.refine_pred_feat[li](
                [feat_warp, up_feat, cv_l], training, bn_momentum
            )
            w = self.refine_pred_w[li]([feat_warp, up_w, cv_l], training, bn_momentum)

            pooled = softmax_valid(predict, w, mask_warp)
            q_det, t_det = self.refine_head[li](pooled, training)
            q_new, t_new = Q.compose_pose(q_det, t_det, q_coarse, t_coarse)

            qs[li], ts[li] = q_new, t_new
            q_coarse, t_coarse = q_new, t_new
            coarser_xyz_proj = xyz_warp_proj
            coarser_w_proj = w.reshape(b, hl, wl, -1)
            coarser_predict_proj = predict.reshape(b, hl, wl, -1)

        return {
            "q": [Q.qnormalize(q) for q in qs],  # [l0, l1, l2, l3]
            "t": ts,
        }
