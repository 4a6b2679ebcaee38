"""Sharded training step: params replicated, batch split over the ``data``
mesh axis, gradient all-reduce compiled by XLA from the output shardings.

This is the idiomatic JAX SPMD formulation (annotate shardings, let XLA place
``psum`` on ICI) rather than a port of any reference code — the reference is
single-GPU only (SURVEY.md C23).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..config import ModelConfig, TrainConfig
from ..training.step import make_train_step
from .mesh import batch_sharding, replicated


def make_sharded_train_step(model, model_cfg: ModelConfig, train_cfg: TrainConfig, mesh: Mesh,
                            host_projected: bool = False):
    """jit the train step with explicit in/out shardings over ``mesh``.

    state: fully replicated; batch: sharded on the leading axis; rng:
    replicated.  XLA derives the cross-device grad reduction.
    """
    step = make_train_step(model, model_cfg, train_cfg,
                           host_projected=host_projected)
    rep = replicated(mesh)
    bshard = batch_sharding(mesh)

    return jax.jit(
        step,
        in_shardings=(rep, bshard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated(mesh))
