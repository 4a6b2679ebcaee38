"""Train state and optimizer construction.

Reference equivalents: the TF globals in main.py:140-216 (Adam/Momentum with
staircase-decayed lr, global step, trainable loss weights ``w_x``/``w_q``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TrainConfig


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Dict[str, Any]       # {"model": ..., "w_x": scalar, "w_q": scalar}
    batch_stats: Dict[str, Any]
    opt_state: Any


def lr_schedule(cfg: TrainConfig):
    """Staircase exponential decay on samples seen, floored at 1e-5
    (reference main.py:120-128)."""

    def schedule(step):
        samples = step * cfg.batch_size
        lr = cfg.base_learning_rate * jnp.power(
            cfg.lr_decay_rate, jnp.floor(samples / cfg.lr_decay_step)
        )
        return jnp.maximum(lr, cfg.lr_floor)

    return schedule


def bn_momentum_schedule(cfg: TrainConfig):
    """Scheduled BN EMA decay (reference main.py:130-138)."""

    def schedule(step):
        samples = step * cfg.batch_size
        mom = cfg.bn_init_decay * jnp.power(
            cfg.bn_decay_rate, jnp.floor(samples / cfg.bn_decay_step)
        )
        return jnp.minimum(cfg.bn_decay_clip, 1.0 - mom)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    if cfg.optimizer == "adam":
        return optax.adam(learning_rate=sched)
    if cfg.optimizer == "momentum":
        return optax.sgd(learning_rate=sched, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


def create_train_state(model, model_cfg, train_cfg: TrainConfig, rng) -> TrainState:
    h, w = model_cfg.sensor.height, model_cfg.sensor.width
    dummy = jnp.zeros((1, h, w, 3), dtype=jnp.float32)
    rngs = {
        "params": rng,
        "neighbor": jax.random.fold_in(rng, 1),
        "dropout": jax.random.fold_in(rng, 2),
    }
    # jit the init: eager init dispatches thousands of tiny ops, which is
    # minutes of round trips through a remote-TPU tunnel
    variables = jax.jit(model.init, static_argnames=("training",))(
        rngs, dummy, dummy, training=False
    )
    params = {
        "model": variables["params"],
        "w_x": jnp.asarray(train_cfg.w_x_init, dtype=jnp.float32),
        "w_q": jnp.asarray(train_cfg.w_q_init, dtype=jnp.float32),
    }
    optimizer = make_optimizer(train_cfg)
    opt_state = optimizer.init(params)
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
    )
