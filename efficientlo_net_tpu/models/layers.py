"""Flax layer library: set-conv pyramid, attentive cost volume, predictors.

Capability parity with reference ``utils/pointnet_util.py`` (down_conv,
up_conv, cost_volume, flow_predictor) and ``model_util.py:319-343``
(softmax_valid), re-designed TPU-first:

* every 1x1 "conv" is a dense einsum over the channel axis (MXU);
* the per-batch Python loops of the reference (softmax_valid) are replaced by
  masked, vectorized softmax;
* the CUDA window gathers are the XLA/Pallas ops in ``ops.neighbors``;
* batch norm takes its EMA momentum as a call argument so the reference's
  scheduled bn_decay (main.py:130-138) is a traced value, not a rebuild.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import neighbors as nbr

_MASK_NEG = -1e10  # reference pointnet_util.py:94,140


class ScheduledBatchNorm(nn.Module):
    """BatchNorm whose EMA decay is passed per call.

    Matches tf.contrib.layers.batch_norm with updates_collections=None
    (tf_util.py batch_norm_template): normalizes over all axes but the last,
    updates running stats in-place during training.
    """

    epsilon: float = 1e-3  # tf.contrib.layers.batch_norm default

    @nn.compact
    def __call__(self, x, training: bool, momentum):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # stats & normalization in f32
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((feat,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feat,)))

        if training:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing():
                m = jnp.asarray(momentum, dtype=ra_mean.value.dtype)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((x - mean) * inv * scale + bias).astype(in_dtype)


class ConvMLP(nn.Module):
    """Stack of 1x1 convs (dense over channels), each conv->bias->BN->ReLU.

    Mirrors tf_util.conv2d defaults (xavier init, bias, BN, relu) used by
    every MLP in the reference layers.
    """

    features: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool, bn_momentum):
        for i, f in enumerate(self.features):
            x = nn.Dense(
                f,
                kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            if self.bn:
                x = ScheduledBatchNorm(name=f"bn_{i}")(x, training, bn_momentum)
            x = nn.relu(x)
        return x


class Head1x1(nn.Module):
    """conv1d with no BN / activation (pose heads, tf_util.conv1d calls with
    activation_fn=None in pwclo_model.py:197-208)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, kernel_init=nn.initializers.xavier_uniform(), name="dense"
        )(x)


def softmax_valid(feature_bnc, weight_bnc, mask_valid):
    """Masked softmax-weighted pooling over valid points.

    Vectorized equivalent of reference model_util.py:319-343 (which loops the
    batch and boolean-masks): softmax over the N axis restricted to valid
    points, then weighted sum.  Returns (B, 1, C).
    """
    feature_bnc = feature_bnc.astype(jnp.float32)
    logits = jnp.where(
        mask_valid[..., None], weight_bnc.astype(jnp.float32), _MASK_NEG
    )
    w = jax.nn.softmax(logits, axis=1)
    # zero out fully-invalid batches' contributions from masked points
    w = w * mask_valid[..., None]
    pooled = jnp.sum(feature_bnc * w, axis=1, keepdims=True)
    return pooled


def valid_mask_from_xyz(xyz_bn3):
    """(B, N) bool mask: point is valid iff not exactly (0,0,0)
    (reference pwclo_model.py:191-192 and friends)."""
    return jnp.any(xyz_bn3 != 0.0, axis=-1)


class DownConv(nn.Module):
    """Strided set-conv: gather K window neighbors for each strided center,
    per-point MLP on (Δxyz, feat), mask, max-pool over K.

    Parity: reference down_conv (pointnet_util.py:179-250).
    """

    kernel_size: Tuple[int, int]
    k: int
    distance: float
    mlp: Sequence[int]
    out_hw: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz_proj, feat_proj, stride_hw, training, bn_momentum,
                 perm=None, select_fn=None):
        """``select_fn`` overrides the neighbor select+group (e.g. the
        W-axis ring-sharded ``parallel.ring.ring_select_and_group``); it must
        accept the same (xyz, feats, kernel_size, k, distance, center_stride,
        mode, perm) signature and return (xyz_group, feat_group, mask)."""
        b, h, w, _ = xyz_proj.shape
        oh, ow = self.out_hw

        if select_fn is not None:
            xyz_group, feat_group, mask = select_fn(
                xyz_proj, feat_proj, self.kernel_size, self.k, self.distance,
                center_stride=tuple(stride_hw), mode=nbr.FIRST_K, perm=perm,
            )
        else:
            xyz_group, feat_group, mask = nbr.select_and_group(
                xyz_proj, feat_proj, self.kernel_size, self.k, self.distance,
                center_stride=tuple(stride_hw), mode=nbr.FIRST_K, perm=perm,
                fused=not training,  # fused emission carries no value gradients
            )
        mask = jax.lax.stop_gradient(mask)

        new_xyz_proj = xyz_proj[:, :: stride_hw[0], :: stride_hw[1], :]
        new_xyz = new_xyz_proj.reshape(b, oh * ow, 3)

        diff = xyz_group - new_xyz[:, :, None, :]
        grouped = jnp.concatenate([diff, feat_group], axis=-1)

        out = ConvMLP(self.mlp, dtype=self.dtype, name="mlp")(
            grouped, training, bn_momentum
        )
        out = out * mask
        out = jnp.max(out, axis=2)  # (B, N, C)
        return out, new_xyz_proj


class UpConv(nn.Module):
    """Upsampling set-conv: dense centers query the sparse level's features
    in a strided window; MLP -> masked max-pool -> concat dense feats -> MLP2.

    Parity: reference up_conv (pointnet_util.py:254-316); uses first-K random
    selection like the reference (fused_conv_random_k at :272).
    """

    kernel_size: Tuple[int, int]
    nsample: int
    distance: float
    stride_hw: Tuple[int, int]
    mlp: Sequence[int]
    mlp2: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz1_proj, xyz2_proj, feat1, feat2_proj, training, bn_momentum, perm=None):
        b, h, w, _ = xyz1_proj.shape
        idx, mask = nbr.select_neighbors(
            xyz1_proj, xyz2_proj, self.kernel_size, self.nsample,
            self.distance, source_stride=tuple(self.stride_hw),
            mode=nbr.FIRST_K, perm=perm,
        )
        mask = jax.lax.stop_gradient(mask)

        both = nbr.gather_by_index(
            jnp.concatenate([xyz2_proj, feat2_proj], axis=-1), idx
        ) * mask
        up_xyz, up_feat = both[..., :3], both[..., 3:]

        xyz1 = xyz1_proj.reshape(b, h * w, 3)
        diff = up_xyz - xyz1[:, :, None, :]
        grouped = jnp.concatenate([diff, up_feat], axis=-1)

        out = ConvMLP(self.mlp, dtype=self.dtype, name="mlp")(grouped, training, bn_momentum)
        out = out * mask
        out = jnp.max(out, axis=2)  # (B, HW, C)

        concat = jnp.concatenate([out, feat1], axis=-1)
        out2 = ConvMLP(self.mlp2, dtype=self.dtype, name="mlp2")(concat, training, bn_momentum)
        return out2


class CostVolume(nn.Module):
    """Projection-aware attentive cost volume.

    Parity: reference cost_volume (pointnet_util.py:33-149).
    Stage 1: each frame-1 point takes nsample_q windowed-KNN frame-2
    neighbors (distance unbounded: the reference hard-codes 1000 at :51),
    encodes (p1, p2, Δ, ‖Δ‖, f1, f2), attends with a masked softmax.
    Stage 2: self-aggregation over nsample first-K frame-1 neighbors with a
    second masked-softmax attention.
    """

    kernel_size1: Tuple[int, int]
    kernel_size2: Tuple[int, int]
    nsample: int
    nsample_q: int
    distance: float
    mlp1: Sequence[int]
    mlp2: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, warped_xyz1_proj, xyz2_proj, feat1_proj, feat2_proj,
                 training, bn_momentum, perm=None):
        b, h, w, _ = warped_xyz1_proj.shape
        n = h * w

        # ---- stage 1: cross-frame attention ------------------------------
        idx_q, mask_q = nbr.select_neighbors(
            warped_xyz1_proj, xyz2_proj, self.kernel_size2,
            self.nsample_q, 1000.0, mode=nbr.KNN,
        )
        mask_q = jax.lax.stop_gradient(mask_q)

        both_q = nbr.gather_by_index(
            jnp.concatenate([xyz2_proj, feat2_proj], axis=-1), idx_q
        ) * mask_q
        qi_xyz, qi_feat = both_q[..., :3], both_q[..., 3:]  # (B,N,Kq,*)

        xyz1 = warped_xyz1_proj.reshape(b, n, 3)
        feat1 = feat1_proj.reshape(b, n, -1)

        pi_xyz = jnp.broadcast_to(xyz1[:, :, None, :], qi_xyz.shape)
        pi_feat = jnp.broadcast_to(
            feat1[:, :, None, :], qi_feat.shape[:3] + (feat1.shape[-1],)
        )
        diff = qi_xyz - pi_xyz
        euc = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-20)
        xyz_enc_in = jnp.concatenate([pi_xyz, qi_xyz, diff, euc], axis=-1)
        feat_in = jnp.concatenate([xyz_enc_in, pi_feat, qi_feat], axis=-1)

        feat_emb = ConvMLP(self.mlp1, dtype=self.dtype, name="cv_mlp1")(
            feat_in, training, bn_momentum
        )
        xyz_enc = ConvMLP((self.mlp1[-1],), dtype=self.dtype, name="cv_xyz")(
            xyz_enc_in, training, bn_momentum
        )
        attn_in = jnp.concatenate([xyz_enc, feat_emb], axis=-1)
        attn = ConvMLP(self.mlp2, dtype=self.dtype, name="cv_sum_mlp")(
            attn_in, training, bn_momentum
        )
        attn = jnp.where(mask_q > 0, attn.astype(jnp.float32), _MASK_NEG)
        wq = jax.nn.softmax(attn, axis=2)
        first = jnp.sum(wq * feat_emb.astype(jnp.float32), axis=2)  # (B, N, C)
        first_proj = first.reshape(b, h, w, -1)

        # ---- stage 2: self-aggregation ----------------------------------
        idx_p, mask_p = nbr.select_neighbors(
            warped_xyz1_proj, warped_xyz1_proj, self.kernel_size1,
            self.nsample, self.distance, mode=nbr.FIRST_K, perm=perm,
        )
        mask_p = jax.lax.stop_gradient(mask_p)

        both_p = nbr.gather_by_index(
            jnp.concatenate([warped_xyz1_proj, first_proj], axis=-1), idx_p
        ) * mask_p
        pc_grouped_xyz, pc_grouped_feat = both_p[..., :3], both_p[..., 3:]

        pc_xyz_new = jnp.broadcast_to(
            xyz1[:, :, None, :], pc_grouped_xyz.shape
        )
        pc_feat_new = jnp.broadcast_to(
            feat1[:, :, None, :], pc_grouped_feat.shape[:3] + (feat1.shape[-1],)
        )
        pc_diff = pc_grouped_xyz - pc_xyz_new
        pc_euc = jnp.sqrt(jnp.sum(pc_diff * pc_diff, axis=-1, keepdims=True) + 1e-20)
        pc_xyz_in = jnp.concatenate([pc_xyz_new, pc_grouped_xyz, pc_diff, pc_euc], axis=-1)

        pc_xyz_enc = ConvMLP((self.mlp1[-1],), dtype=self.dtype, name="cv_sum_xyz")(
            pc_xyz_in, training, bn_momentum
        )
        pc_attn_in = jnp.concatenate([pc_xyz_enc, pc_feat_new, pc_grouped_feat], axis=-1)
        pc_attn = ConvMLP(self.mlp2, dtype=self.dtype, name="cv_agg_mlp")(
            pc_attn_in, training, bn_momentum
        )
        pc_attn = jnp.where(mask_p > 0, pc_attn.astype(jnp.float32), _MASK_NEG)
        wp = jax.nn.softmax(pc_attn, axis=2)
        out = jnp.sum(wp * pc_grouped_feat.astype(jnp.float32), axis=2)
        return out


class FlowPredictor(nn.Module):
    """Concat(points, upsampled, cost) -> MLP
    (reference flow_predictor, pointnet_util.py:153-175)."""

    mlp: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, training, bn_momentum):
        x = jnp.concatenate([v for v in inputs if v is not None], axis=-1)
        return ConvMLP(self.mlp, dtype=self.dtype, name="mlp")(x, training, bn_momentum)
