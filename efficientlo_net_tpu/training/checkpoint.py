"""Orbax-based checkpointing with best-metric retention.

Reference equivalent: ``tf.train.Saver`` full-graph save/restore with
best-model directories named by validation error (main.py:179,194-197,
227-249).  Here: params / batch_stats / opt_state / step as one pytree, plus
a ``best`` alias updated when the validation t_rel improves.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    def save(self, state: TrainState, metrics: Optional[dict] = None) -> None:
        step = int(jax.device_get(state.step))
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(state))
        )
        self._mgr.wait_until_finished()
        if metrics:
            with open(
                os.path.join(self.directory, f"metrics_{step}.json"), "w"
            ) as f:
                json.dump(metrics, f)

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = jax.device_get(state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # --- best-model tracking (reference main.py:227-249) -----------------
    def best_error(self) -> float:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)["val_t_rel"]
        return float("inf")

    def maybe_save_best(self, state: TrainState, val_t_rel: float) -> bool:
        if not np.isfinite(val_t_rel) or val_t_rel >= self.best_error():
            return False
        step = int(jax.device_get(state.step))
        self.save(state, metrics={"val_t_rel": val_t_rel})
        with open(self._best_path, "w") as f:
            json.dump({"val_t_rel": val_t_rel, "step": step}, f)
        return True
