"""Training loop orchestration.

Reference equivalent: ``main()`` + ``train_one_epoch`` (main.py:140-398) —
epoch loop over shuffled frame indices, periodic validation driving
best-checkpoint retention (every 20 epochs for the first 100, every 2 after,
main.py:227-249), scalar logging.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..data.kitti import SEQ_LENGTH_TABLE, OdometryDataset
from ..data.loader import PrefetchLoader
from ..evaluation.runner import evaluate_sequences, mean_t_rel
from ..models.pwclo import PWCLONet
from ..parallel.data_parallel import make_sharded_train_step, replicate_state
from ..parallel.mesh import make_mesh, shard_batch
from ..training.checkpoint import CheckpointManager
from ..training.state import create_train_state
from ..training.step import (
    make_eval_step,
    make_streaming_eval_fns,
    make_train_step,
)
from ..utils.logging import Logger


def train_indices_for(sequences: Sequence[int]) -> np.ndarray:
    """All global frame indices belonging to the given sequences."""
    parts = [
        np.arange(SEQ_LENGTH_TABLE[s], SEQ_LENGTH_TABLE[s + 1]) for s in sequences
    ]
    return np.concatenate(parts)


class Trainer:
    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        data_root: str,
        log_dir: str,
        gt_dir: Optional[str] = None,
        train_list: Sequence[int] = tuple(range(7)),
        val_list: Sequence[int] = tuple(range(7, 11)),
        seed: int = 0,
        use_mesh: bool = True,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.logger = Logger(os.path.join(log_dir, "log_train.txt"))
        self._snapshot_config(model_cfg, train_cfg)
        self.gt_dir = gt_dir or os.path.join(
            os.path.dirname(os.path.abspath(data_root)), "ground_truth_pose"
        )
        self.train_list = list(train_list)
        self.val_list = list(val_list)
        self.seed = seed
        self.start_epoch = 0  # advanced by restore()

        self.dataset = OdometryDataset(
            data_root, num_points=model_cfg.sensor.num_points,
            gt_pose_dir=self.gt_dir,
            cache_scans=train_cfg.cache_decoded_scans,
        )
        self.model = PWCLONet(model_cfg)
        import time as _time

        _t0 = _time.time()
        self.state = create_train_state(
            self.model, model_cfg, train_cfg, jax.random.key(seed)
        )
        _t1 = _time.time()
        self.ckpt = CheckpointManager(os.path.join(log_dir, "checkpoints"))
        if _t1 - _t0 > 5.0:
            self.logger.log(f"create_train_state took {_t1 - _t0:.1f}s")

        self.host_projection = train_cfg.resolved_host_projection()
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = make_mesh()
            self.state = replicate_state(self.state, self.mesh)
            self.train_step = make_sharded_train_step(
                self.model, model_cfg, train_cfg, self.mesh,
                host_projected=self.host_projection,
            )
        else:
            self.mesh = None
            self.train_step = jax.jit(
                make_train_step(self.model, model_cfg, train_cfg,
                                host_projected=self.host_projection),
                donate_argnums=(0,),
            )
        self.eval_step = make_eval_step(self.model, model_cfg)
        self.stream_eval_fns = make_streaming_eval_fns(self.model, model_cfg)

    def _snapshot_config(self, model_cfg, train_cfg) -> None:
        """Reproducibility snapshot into the log dir — the reference copies
        its source files (main.py:96-100); configs are the moving parts
        here."""
        import dataclasses
        import json

        def as_dict(cfg):
            return dataclasses.asdict(cfg)

        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            json.dump(
                {"model": as_dict(model_cfg), "train": as_dict(train_cfg)},
                f, indent=2, default=str,
            )

    def restore(self, step: Optional[int] = None,
                path: Optional[str] = None) -> None:
        """Restore state + epoch metadata; ``path`` overrides the trainer's
        own checkpoint dir (warm start from another run, reference
        main.py:194-197)."""
        mgr = self.ckpt if path is None else CheckpointManager(
            os.path.abspath(path)
        )
        import time as _time

        _t0 = _time.time()
        self.state = mgr.restore(self.state, step)
        if self.mesh is not None:
            # the manager restores host arrays; re-place on the mesh
            self.state = replicate_state(self.state, self.mesh)
        if _time.time() - _t0 > 5.0:
            self.logger.log(f"checkpoint restore took {_time.time() - _t0:.1f}s")
        meta = mgr.metadata(step)
        saved_epoch = meta.get("epoch")
        if saved_epoch is not None:
            self.start_epoch = int(saved_epoch) + 1
        self.logger.log(
            f"restored checkpoint at step {int(self.state.step)} "
            f"(resuming at epoch {self.start_epoch})"
        )

    def load_pretrained(self, path: str) -> dict:
        """Load a portable weight artifact (``pretrained.load_pretrained``)
        into the train state: the artifact's inference variables replace
        the model params and batch_stats; optimizer state, step counter,
        and the learned loss weights keep their current values (an artifact
        carries no training state — use ``restore`` for exact resume).
        Returns the artifact's metadata header."""
        from ..pretrained import load_pretrained

        variables, meta = load_pretrained(path)
        params = dict(self.state.params)
        params["model"] = variables["params"]
        self.state = self.state.replace(
            params=params,
            batch_stats=variables.get("batch_stats",
                                      self.state.batch_stats),
        )
        self.logger.log(
            f"loaded pretrained artifact {path} "
            f"(epochs={meta.get('trained_epochs')}, "
            f"params={meta.get('param_count')})"
        )
        return meta

    def _device_batch(self, batch):
        if self.train_cfg.quantized_transfer:
            from ..data.loader import quantize_points

            if "pc1" in batch:
                batch = dict(
                    batch,
                    pc1=quantize_points(batch["pc1"]),
                    pc2=quantize_points(batch["pc2"]),
                )
            elif "p1" in batch:  # host-projected images quantize the same way
                batch = dict(
                    batch,
                    p1=quantize_points(batch["p1"]),
                    p2=quantize_points(batch["p2"]),
                )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = shard_batch(self.mesh, batch)
        return batch

    def train_one_epoch(self, epoch: int, limit_batches: Optional[int] = None) -> float:
        loader = PrefetchLoader(
            self.dataset,
            train_indices_for(self.train_list),
            self.train_cfg.batch_size,
            training=True,
            seed=self.seed,
            host_projection_sensor=(
                self.model_cfg.sensor if self.host_projection else None
            ),
        )
        losses = []
        t_epoch = time.time()
        rng = jax.random.key(hash((self.seed, epoch)) % (2**31))
        from ..data.loader import device_prefetch

        batches = device_prefetch(loader.epoch(epoch), self._device_batch)
        for bi, batch in enumerate(batches):
            if limit_batches is not None and bi >= limit_batches:
                break
            step_rng = jax.random.fold_in(rng, bi)
            self.state, metrics = self.train_step(self.state, batch, step_rng)
            if bi % 50 == 0:
                loss = float(jax.device_get(metrics["loss"]))
                losses.append(loss)
                step = int(jax.device_get(self.state.step))
                self.logger.log(
                    f"epoch {epoch} batch {bi}/{len(loader)} loss {loss:.4f}"
                )
                self.logger.scalar("loss", loss, step)
                for name in ("l0_loss", "l1_loss", "l2_loss", "l3_loss"):
                    self.logger.scalar(
                        name, float(jax.device_get(metrics[name])), step
                    )
                self.logger.scalar(
                    "learning_rate",
                    float(self.train_cfg.learning_rate(step)), step,
                )
                self.logger.scalar(
                    "bn_decay", float(self.train_cfg.bn_momentum(step)), step
                )
        self.logger.log(
            f"epoch {epoch} done in {time.time() - t_epoch:.1f}s "
            f"mean-sampled-loss {np.mean(losses) if losses else float('nan'):.4f}"
        )
        return float(np.mean(losses)) if losses else float("nan")

    def validate(self) -> float:
        params = jax.device_get(self.state.params)
        stats = jax.device_get(self.state.batch_stats)
        # multi-host: each host evaluates its share of the sequences and the
        # scalar is aggregated across processes
        from ..parallel.distributed import (
            aggregate_mean_t_rel,
            shard_sequences_by_host,
        )

        local_seqs = shard_sequences_by_host(self.val_list)
        results = evaluate_sequences(
            self.eval_step, params, stats, self.dataset, local_seqs,
            gt_dir=self.gt_dir, result_dir=os.path.join(self.log_dir, "val"),
            batch_size=self.train_cfg.batch_size, log=self.logger.log,
            stream_fns=self.stream_eval_fns,
        )
        if jax.process_count() > 1:
            return aggregate_mean_t_rel(results)
        return mean_t_rel(results)

    def fit(self, max_epoch: Optional[int] = None) -> None:
        max_epoch = max_epoch or self.train_cfg.max_epoch
        for epoch in range(self.start_epoch, max_epoch):
            self.logger.log(f"**** EPOCH {epoch:03d} ****")
            self.train_one_epoch(epoch)
            # validation cadence: reference main.py:227-249
            if (epoch % 20 == 0 and epoch <= 100) or (epoch % 2 == 0 and epoch > 100):
                val = self.validate()
                self.logger.log(f"epoch {epoch} val t_rel {val:.4f}")
                # always persist latest (resume point), then mark best if improved
                is_best = np.isfinite(val) and val < self.ckpt.best_error()
                step = self.ckpt.save(
                    self.state, metrics={"val_t_rel": val}, epoch=epoch
                )
                if is_best:
                    self.ckpt.mark_best(step, val, state=self.state)
                    self.logger.log(f"new best model saved (val t_rel {val:.4f})")
