"""Orbax-based checkpointing with best-metric retention and resume metadata.

Reference equivalent: ``tf.train.Saver`` full-graph save/restore with
best-model directories named by validation error (main.py:179,194-197,
227-249).  Here: params / batch_stats / opt_state / step as one pytree, a
``meta_{step}.json`` sidecar recording the epoch (so ``Trainer.fit`` can
resume at the right epoch — the reference always restarts at epoch 0), and a
``best.json`` alias updated when the validation t_rel improves.

Multi-host: the train state is fully replicated (device_get'd to host
numpy before saving), so persistence is a process-local file write — all
writes are gated on ``jax.process_index() == 0`` and followed by a global
barrier so non-zero processes cannot race ahead and read a half-written
checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _is_primary() -> bool:
    return jax.process_index() == 0


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        if _is_primary():
            os.makedirs(self.directory, exist_ok=True)
        _barrier("ckpt_dir")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        # the best model lives outside the latest-N rotation (its own
        # single-slot manager) so routine saves can never evict it —
        # mirrors the reference's dedicated best-model directories
        # (main.py:233-235)
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
        )
        self._best_path = os.path.join(self.directory, "best.json")

    def _meta_path(self, step: int) -> str:
        return os.path.join(self.directory, f"meta_{step}.json")

    def save(
        self,
        state: TrainState,
        metrics: Optional[dict] = None,
        epoch: Optional[int] = None,
    ) -> int:
        """Persist the state once (idempotent per step). Returns the step.

        Multi-host: every process calls this (orbax's CheckpointManager is
        itself multihost-coordinated and performs the disk write from the
        primary only); the JSON sidecar is written by process 0 alone."""
        step = int(jax.device_get(state.step))
        if step not in (self._mgr.all_steps() or []):
            self._mgr.save(
                step, args=ocp.args.StandardSave(jax.device_get(state))
            )
            self._mgr.wait_until_finished()
        if _is_primary():
            meta = {"epoch": epoch}
            if metrics:
                meta.update(metrics)
            with open(self._meta_path(step), "w") as f:
                json.dump(meta, f)
        _barrier("ckpt_meta")
        return step

    @staticmethod
    def _restore_host(mgr, step: int, state: TrainState) -> TrainState:
        """Restore onto HOST arrays: with a remote-TPU (axon) default
        device, orbax otherwise materializes each of the ~1700 state leaves
        on the device one by one — ~7 minutes of tunnel round trips per
        process (measured; the CPU restore is seconds).  The first jitted
        step ships the whole host pytree in one transfer instead.  Callers
        that shard the state over a mesh re-place it afterwards
        (Trainer.restore -> replicate_state)."""
        # abstract target: shapes/dtypes only — a concrete target would be
        # jax.device_get(state), i.e. ~1700 leaves pulled through the
        # tunnel before the restore even starts (observed to wedge
        # indefinitely on a degraded tunnel; pure host restore cannot)
        target = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            state,
        )
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None and jax.default_backend() != "cpu":
            with jax.default_device(cpu):
                restored = mgr.restore(
                    step, args=ocp.args.StandardRestore(target)
                )
            return jax.device_get(restored)
        return mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._restore_host(self._mgr, step, state)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def metadata(self, step: Optional[int] = None) -> dict:
        """Sidecar metadata (epoch, metrics) for a step; {} if absent."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None or not os.path.exists(self._meta_path(step)):
            return {}
        with open(self._meta_path(step)) as f:
            return json.load(f)

    # --- best-model tracking (reference main.py:227-249) -----------------
    def best_error(self) -> float:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)["val_t_rel"]
        return float("inf")

    def mark_best(
        self, step: int, val_t_rel: float, state: Optional[TrainState] = None
    ) -> None:
        """Record ``step`` as the best model.  With ``state`` given, also
        copy it into the eviction-proof ``best/`` slot (otherwise only
        ``best.json`` is updated — valid as long as the step is still in
        the latest-N rotation)."""
        if state is not None:
            self._best_mgr.save(
                step, args=ocp.args.StandardSave(jax.device_get(state))
            )
            self._best_mgr.wait_until_finished()
        if _is_primary():
            with open(self._best_path, "w") as f:
                json.dump({"val_t_rel": val_t_rel, "step": step}, f)
        _barrier("ckpt_best")

    def restore_best(self, state: TrainState) -> TrainState:
        """Restore the best-validation model (the ``best/`` slot, falling
        back to the rotation step recorded in ``best.json``)."""
        step = self._best_mgr.latest_step()
        if step is not None:
            return self._restore_host(self._best_mgr, step, state)
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return self.restore(state, json.load(f)["step"])
        raise FileNotFoundError(f"no best checkpoint in {self.directory}")

    def maybe_save_best(
        self,
        state: TrainState,
        val_t_rel: float,
        epoch: Optional[int] = None,
    ) -> bool:
        """Save + mark best when ``val_t_rel`` improves. Every process calls
        this with the same (host-aggregated) value; only process 0 writes."""
        if not np.isfinite(val_t_rel) or val_t_rel >= self.best_error():
            return False
        step = self.save(state, metrics={"val_t_rel": val_t_rel}, epoch=epoch)
        self.mark_best(step, val_t_rel, state=state)
        return True
