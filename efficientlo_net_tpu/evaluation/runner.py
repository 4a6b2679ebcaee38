"""Sequence evaluation runner: model inference over a KITTI sequence ->
trajectory -> RPE metrics, all in-process.

Replaces the reference flow of main.py:459-599 (batched sess.run loop, txt
dump, then ``os.popen("python ./kitti_evaluation.py ...")`` and stdout
grepping) with a direct library call.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..data.kitti import SEQ_LENGTH_TABLE, SEQ_NAMES, OdometryDataset, load_tr
from ..data.loader import PrefetchLoader
from .kitti_metrics import SequenceResult, evaluate_sequence, load_poses, poses_from_rows
from .odometry import integrate_sequence, save_kitti_trajectory


def sequence_indices(seq: int) -> np.ndarray:
    return np.arange(SEQ_LENGTH_TABLE[seq], SEQ_LENGTH_TABLE[seq + 1])


def predict_sequence(
    eval_step,
    params,
    batch_stats,
    dataset: OdometryDataset,
    seq: int,
    batch_size: int = 8,
    num_workers: int = 4,
    progress=None,
) -> tuple:
    """Runs the jitted eval step over every frame pair of a sequence.

    Returns (quats (N,4), trans (N,3)) numpy arrays.  The last partial batch
    is padded (the reference reuses stale rows instead, main.py:507-518 — we
    pad with repeats and slice, which is equivalent for the used rows).
    """
    import jax.numpy as jnp

    idxs = sequence_indices(seq)
    n = len(idxs)
    loader = PrefetchLoader(
        dataset, idxs, batch_size, training=False,
        num_workers=num_workers, drop_last=False,
    )
    from ..data.loader import quantize_points

    quats, trans = [], []
    for bi, batch in enumerate(loader.epoch(0)):
        if progress is not None and bi % 40 == 0:
            progress(f"seq {seq} eval batch {bi}")
        bsz = batch["pc1"].shape[0]
        if bsz < batch_size:  # pad to the compiled batch shape
            pad = batch_size - bsz
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
        # int16 transfer (1.25 mm LSB, same as training's
        # quantized_transfer): 4x fewer host->device bytes — the eval
        # bottleneck on a bandwidth-limited tunnel; the jitted step
        # dequantizes (training/step.py _forward_inputs)
        batch = dict(batch, pc1=quantize_points(batch["pc1"]),
                     pc2=quantize_points(batch["pc2"]))
        out = eval_step(
            params, batch_stats, {k: jnp.asarray(v) for k, v in batch.items()}
        )
        quats.append(np.asarray(out["q"])[:bsz])
        trans.append(np.asarray(out["t"])[:bsz])
    q = np.concatenate(quats)[:n]
    t = np.concatenate(trans)[:n]
    return q, t


def predict_sequence_streaming(
    encode_step,
    correlate_step,
    params,
    batch_stats,
    dataset: OdometryDataset,
    seq: int,
    batch_size: int = 8,
    num_workers: int = 4,
    progress=None,
) -> tuple:
    """Pyramid-cached sequence prediction: each scan is read, projected and
    encoded ONCE; consecutive pyramids are correlated in shifted batches.

    Halves the per-frame IO, projection, and tower cost of
    ``predict_sequence`` with bit-identical outputs (eval towers are
    deterministic); see training/step.py make_streaming_eval_fns.
    Frame 0 pairs with itself (reference kitti_dataset.py:45-49)."""
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    n = len(sequence_indices(seq))
    quats, trans = [], []
    prev_tail = None  # last real frame's pyramid from the previous batch

    with ThreadPoolExecutor(max_workers=num_workers) as pool, \
            ThreadPoolExecutor(max_workers=1) as reader:

        def read_block(s):
            frames = list(range(s, min(s + batch_size, n)))
            bsz = len(frames)
            scans = list(pool.map(lambda f: dataset.read_scan(seq, f), frames))
            if bsz < batch_size:  # pad to the compiled batch shape
                scans += [scans[-1]] * (batch_size - bsz)
            return np.stack(scans), bsz

        # double-buffer: the next block's disk reads overlap the device's
        # (asynchronously dispatched) encode/correlate of the current block
        pending = reader.submit(read_block, 0)
        for s in range(0, n, batch_size):
            if progress is not None and (s // batch_size) % 40 == 0:
                progress(f"seq {seq} eval frame {s}/{n}")
            block, bsz = pending.result()
            if s + batch_size < n:
                pending = reader.submit(read_block, s + batch_size)
            from ..data.loader import quantize_points

            pts = jnp.asarray(quantize_points(block))  # int16 transfer

            pyr = encode_step(params, batch_stats, pts)
            if prev_tail is None:  # frame 0 pairs with itself
                prev_tail = jax.tree_util.tree_map(lambda a: a[:1], pyr)
            # frame s+i pairs with s+i-1: shift the batch by one, splicing
            # in the previous batch's tail
            pyr_prev = jax.tree_util.tree_map(
                lambda tail, cur: jnp.concatenate([tail, cur[:-1]], axis=0),
                prev_tail, pyr,
            )
            out = correlate_step(params, batch_stats, pyr, pyr_prev)
            quats.append(np.asarray(out["q"])[:bsz])
            trans.append(np.asarray(out["t"])[:bsz])
            prev_tail = jax.tree_util.tree_map(
                lambda a: a[bsz - 1: bsz], pyr
            )
    return np.concatenate(quats)[:n], np.concatenate(trans)[:n]


def evaluate_sequences(
    eval_step,
    params,
    batch_stats,
    dataset: OdometryDataset,
    sequences: Sequence[int],
    gt_dir: str,
    result_dir: Optional[str] = None,
    batch_size: int = 8,
    log=print,
    make_plots: bool = False,
    stream_fns=None,
) -> Dict[int, SequenceResult]:
    """Full eval over multiple sequences; returns per-sequence results and
    (optionally) writes KITTI trajectory txt files + plots (reference
    kitti_evaluation.py writes path/xyz/rpy/error plots per sequence).

    ``stream_fns``: optional (encode_step, correlate_step) from
    training.step.make_streaming_eval_fns — predicts with pyramid caching
    (each scan read/projected/encoded once) instead of the pairwise
    ``eval_step``; identical outputs, about half the cost."""
    results = {}
    for seq in sequences:
        name = SEQ_NAMES[seq]
        tr, _ = load_tr(os.path.join(dataset.root, name, "calib.txt"))
        if stream_fns is not None:
            q, t = predict_sequence_streaming(
                stream_fns[0], stream_fns[1], params, batch_stats,
                dataset, seq, batch_size, progress=log,
            )
        else:
            q, t = predict_sequence(
                eval_step, params, batch_stats, dataset, seq, batch_size,
                progress=log,
            )
        rows = integrate_sequence(q, t, tr)
        if result_dir is not None:
            os.makedirs(result_dir, exist_ok=True)
            save_kitti_trajectory(os.path.join(result_dir, f"{name}_pred.txt"), rows)

        gt_path = os.path.join(gt_dir, f"{name}.txt")
        poses_res = poses_from_rows(rows)
        if not os.path.exists(gt_path):
            log(f"seq{name}: no ground truth, skipping metrics")
            if make_plots and result_dir is not None:
                from .plots import write_all_plots

                write_all_plots(name, None, poses_res, [],
                                os.path.join(result_dir, f"{name}_eval"))
            continue
        poses_gt = load_poses(gt_path)
        res = evaluate_sequence(poses_gt, poses_res, seq=name)
        results[seq] = res
        log(res.summary())
        if result_dir is not None:
            from .kitti_metrics import save_sequence_errors

            save_sequence_errors(
                res.errors, os.path.join(result_dir, f"{name}_errors.txt")
            )
        if make_plots and result_dir is not None:
            from .plots import write_all_plots

            write_all_plots(name, poses_gt, poses_res, res.errors,
                            os.path.join(result_dir, f"{name}_eval"))
    return results


def mean_t_rel(results: Dict[int, SequenceResult]) -> float:
    """Validation scalar driving best-checkpoint retention
    (reference main.py:591-597)."""
    if not results:
        return float("nan")
    return float(np.mean([r.t_rel for r in results.values()]))
