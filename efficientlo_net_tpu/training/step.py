"""Jitted train / eval steps.

One fused XLA program per step: preprocess -> project -> forward -> loss ->
grad -> optimizer update.  The reference runs preprocessing inside its TF
graph too (pwclo_model.py:61-64) but feeds numpy via feed_dict; here batches
arrive as device arrays and buffers are donated.
"""

from __future__ import annotations

from typing import Dict

import jax

from ..config import ModelConfig, TrainConfig
from ..models.losses import total_loss
from ..models.preprocess import preprocess
from ..ops.projection import project_to_range_image
from .state import TrainState, bn_momentum_schedule, make_optimizer


def _forward_inputs(batch, sensor):
    """preprocess + project both frames (training and eval share this)."""
    import jax.numpy as jnp

    from ..data.loader import POINT_QUANT_SCALE

    pc1, pc2 = batch["pc1"], batch["pc2"]
    if jnp.issubdtype(pc1.dtype, jnp.integer):
        # int16 quantized transfer (TrainConfig.quantized_transfer)
        inv = jnp.float32(1.0 / POINT_QUANT_SCALE)
        pc1 = pc1.astype(jnp.float32) * inv
        pc2 = pc2.astype(jnp.float32) * inv
    batch = dict(batch, pc1=pc1, pc2=pc2)
    pc1, pc2, q_gt, t_gt = preprocess(
        batch["pc1"], batch["pc2"], batch["T_gt"],
        batch["T_trans"], batch["T_trans_inv"], batch["aug_frame"],
        max_planar_radius=sensor.max_planar_radius,
    )
    h, w = sensor.height, sensor.width
    # "packed" is safe here: preprocess() has already cropped to <= 35 m
    p1, _ = project_to_range_image(pc1, None, h, w, sensor, method="packed")
    p2, _ = project_to_range_image(pc2, None, h, w, sensor, method="packed")
    # input projections carry no gradient (reference pwclo_model.py:66-67)
    return jax.lax.stop_gradient(p1), jax.lax.stop_gradient(p2), q_gt, t_gt


def _forward_inputs_projected(batch):
    """Inputs for the host-projected path (data/host_preprocess.py): range
    images arrive pre-cropped/augmented/projected from the loader's worker
    threads; only the GT quaternion derivation stays on device."""
    import jax.numpy as jnp

    from ..models.preprocess import gt_quat

    p1, p2 = batch["p1"], batch["p2"]
    if jnp.issubdtype(p1.dtype, jnp.integer):
        # int16 image transfer (TrainConfig.quantized_transfer): XYZ pixel
        # values share the point quantization (1.25 mm LSB, ranges <= 35 m)
        from ..data.loader import POINT_QUANT_SCALE

        inv = jnp.float32(1.0 / POINT_QUANT_SCALE)
        p1 = p1.astype(jnp.float32) * inv
        p2 = p2.astype(jnp.float32) * inv
    q_gt, t_gt = gt_quat(
        batch["T_gt"], batch["T_trans"], batch["T_trans_inv"],
        batch["aug_frame"],
    )
    return (
        jax.lax.stop_gradient(p1),
        jax.lax.stop_gradient(p2),
        q_gt,
        t_gt,
    )


def make_train_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig,
                    host_projected: bool = False):
    """``host_projected=True`` consumes batches whose range images were
    projected on the host (keys p1/p2) instead of raw point clouds —
    removes the ~30% of device step time spent in the scatter-bound input
    projections (docs/perf_breakdown.json)."""
    optimizer = make_optimizer(train_cfg)
    bn_sched = bn_momentum_schedule(train_cfg)

    def loss_fn(params, batch_stats, batch, rng, bn_momentum):
        if host_projected:
            p1, p2, q_gt, t_gt = _forward_inputs_projected(batch)
        else:
            p1, p2, q_gt, t_gt = _forward_inputs(batch, model_cfg.sensor)
        rngs = {
            "neighbor": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
        }
        out, mutated = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            p1, p2, training=True, bn_momentum=bn_momentum, stochastic=True,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss, metrics = total_loss(out, q_gt, t_gt, params["w_x"], params["w_q"])
        return loss, (mutated["batch_stats"], metrics)

    def train_step(state: TrainState, batch: Dict, rng):
        bn_momentum = bn_sched(state.step)
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng, bn_momentum
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def make_streaming_eval_fns(model, model_cfg: ModelConfig):
    """(encode_step, correlate_step) for pyramid-cached sequence evaluation.

    Over a sequence, every frame appears in two consecutive pairs; the
    pairwise eval_step therefore projects and encodes each scan twice.  With
    identity augmentation the eval preprocessing reduces to the validity
    mask + 35 m crop, which is frame-local — so each frame's projection and
    Siamese tower can be computed ONCE (`encode_step`) and the pairs
    correlated from cached pyramids (`correlate_step`), exactly like the
    live-odometry stream (evaluation/streaming.py).  Eval-mode towers are
    deterministic: results match make_eval_step bit-for-bit."""
    import jax.numpy as jnp

    sensor = model_cfg.sensor
    h, w = sensor.height, sensor.width

    @jax.jit
    def encode_step(params, batch_stats, points):
        if jnp.issubdtype(points.dtype, jnp.integer):
            from ..data.loader import POINT_QUANT_SCALE

            points = points.astype(jnp.float32) * jnp.float32(
                1.0 / POINT_QUANT_SCALE
            )
        keep = jnp.any(points != 0.0, axis=-1) & (
            jnp.linalg.norm(points[..., :2], axis=-1)
            <= sensor.max_planar_radius
        )
        cropped = points * keep[..., None]
        proj, _ = project_to_range_image(
            cropped, None, h, w, sensor, method="packed"
        )
        return model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            proj, False, 0.99, False, method=model._pyramid,
        )

    @jax.jit
    def correlate_step(params, batch_stats, pyr_new, pyr_prev):
        out = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            pyr_new, pyr_prev, training=False,
            method=model.forward_from_pyramids,
        )
        return {"q": out["q"][0], "t": out["t"][0]}

    return encode_step, correlate_step


def make_eval_step(model, model_cfg: ModelConfig):
    """Returns the finest-level (l0) pose prediction — what the odometry
    integrator consumes (reference main.py:530: ops['pred_q']=l0_q)."""

    @jax.jit
    def eval_step(params, batch_stats, batch):
        p1, p2, q_gt, t_gt = _forward_inputs(batch, model_cfg.sensor)
        out = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            p1, p2, training=False,
        )
        return {
            "q": out["q"][0], "t": out["t"][0],
            "q_gt": q_gt, "t_gt": t_gt,
        }

    return eval_step


def identity_batch_fields(batch_size: int):
    """Eval-mode placeholders: identity augmentation (reference
    main.py:309-312)."""
    import numpy as np

    eye = np.tile(np.eye(4, dtype=np.float32), (batch_size, 1, 1))
    return {
        "T_trans": eye,
        "T_trans_inv": eye.copy(),
        "aug_frame": np.ones((batch_size,), dtype=np.int32),
    }
