"""Accuracy diagnostics for the synthetic-drive model (VERDICT r2 item 1).

Separates the failure hypotheses behind the 64% t_rel:
  - train/eval gap (overfitting vs optimization floor): per-pair pose errors
    on a TRAIN sequence vs the eval/holdout sequences;
  - eval-mode BN (EMA stats) vs batch-stats BN;
  - systematic translation scale bias (predicting short/long);
  - error vs motion magnitude.

Run: python tools/diagnose_accuracy.py [--frames 240]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
# the axon client reports ~0s compile times (server-side compile), so any
# positive threshold silently disables persistence on the tunnel backend
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def quat_angle_deg(q_pred, q_gt):
    q_pred = q_pred / np.linalg.norm(q_pred, axis=-1, keepdims=True)
    q_gt = q_gt / np.linalg.norm(q_gt, axis=-1, keepdims=True)
    dot = np.abs(np.sum(q_pred * q_gt, axis=-1)).clip(0, 1)
    return np.degrees(2 * np.arccos(dot))


def quat_yaw_deg(q):
    """Yaw (z rotation, deg) of unit quaternions (N, 4) in wxyz order."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return np.degrees(np.arctan2(2 * (w * z + x * y),
                                 1 - 2 * (y * y + z * z)))


def quat_mul_np(a, b):
    """Hamilton product of (N, 4) wxyz quaternion arrays."""
    w1, x1, y1, z1 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    w2, x2, y2, z2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_euler_zyx_deg(q):
    """(yaw, pitch, roll) in degrees of unit quaternions (N, 4) wxyz."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    return np.degrees(yaw), np.degrees(pitch), np.degrees(roll)


def per_axis_rotation_stats(q_pred, q_gt):
    """Yaw/pitch/roll decomposition of the rotation error (VERDICT r4
    next-3: rotation is the weaker axis and nobody had split it).

    For each axis: the GT motion scale, the error (pred relative to GT,
    from the error quaternion q_pred x q_gt^-1), its bias and std, and the
    regression slope pred ~ slope * gt (1.0 = perfectly tracked, 0 = the
    net ignores that axis and predicts ~zero)."""
    q_pred = q_pred / np.linalg.norm(q_pred, axis=-1, keepdims=True)
    q_gt = q_gt / np.linalg.norm(q_gt, axis=-1, keepdims=True)
    # hemisphere-align so the error quaternion is the small rotation
    sign = np.sign(np.sum(q_pred * q_gt, axis=-1, keepdims=True))
    q_pred = q_pred * np.where(sign == 0, 1.0, sign)
    q_gt_inv = q_gt * np.array([1.0, -1.0, -1.0, -1.0])
    q_err = quat_mul_np(q_pred, q_gt_inv)
    err = np.stack(quat_euler_zyx_deg(q_err), axis=-1)       # (N, 3) deg
    gt = np.stack(quat_euler_zyx_deg(q_gt), axis=-1)
    pred = np.stack(quat_euler_zyx_deg(q_pred), axis=-1)
    out = {}
    for k, name in enumerate(("yaw", "pitch", "roll")):
        g, p, e = gt[:, k], pred[:, k], err[:, k]
        slope = float(np.sum(p * g) / max(np.sum(g * g), 1e-12))
        out[name] = {
            "gt_std_deg": float(g.std()),
            "err_bias_deg": float(e.mean()),
            "err_std_deg": float(e.std()),
            "track_slope": slope,
        }
    return out


def rotation_bias_stats(q_pred, q_gt):
    """Signed yaw decomposition: is the rotation error bias or noise?

    A trajectory t_rel of ~64% from ~0.23 deg/pair rotation error requires
    the error to be mostly BIAS (a random walk of that size only drifts a
    few percent); the regression slope of predicted vs GT yaw tells whether
    the net systematically under-rotates in corners.
    """
    q_pred = q_pred / np.linalg.norm(q_pred, axis=-1, keepdims=True)
    q_gt = q_gt / np.linalg.norm(q_gt, axis=-1, keepdims=True)
    yaw_p, yaw_g = quat_yaw_deg(q_pred), quat_yaw_deg(q_gt)
    err = yaw_p - yaw_g
    # least-squares slope through the origin: pred_yaw ~= slope * gt_yaw
    slope = float(np.sum(yaw_p * yaw_g) / max(np.sum(yaw_g * yaw_g), 1e-12))
    return {
        "yaw_bias_deg": float(err.mean()),
        "yaw_err_std_deg": float(err.std()),
        "yaw_scale": slope,
        "gt_yaw_mean_abs_deg": float(np.abs(yaw_g).mean()),
    }


def per_pair_stats(eval_step, params, stats, dataset, seq, frames, batch):
    import jax.numpy as jnp

    from efficientlo_net_tpu.data.kitti import SEQ_LENGTH_TABLE
    from efficientlo_net_tpu.data.loader import PrefetchLoader

    idxs = np.arange(SEQ_LENGTH_TABLE[seq] + 1,
                     SEQ_LENGTH_TABLE[seq] + 1 + frames)
    loader = PrefetchLoader(dataset, idxs, batch, training=False,
                            drop_last=True)
    qs, ts, qgs, tgs = [], [], [], []
    for b in loader.epoch(0):
        out = eval_step(params, stats, {k: jnp.asarray(v) for k, v in b.items()})
        qs.append(np.asarray(out["q"]))
        ts.append(np.asarray(out["t"]))
        qgs.append(np.asarray(out["q_gt"]))
        tgs.append(np.asarray(out["t_gt"]))
    q = np.concatenate(qs).reshape(-1, 4)
    t = np.concatenate(ts).reshape(-1, 3)
    qg = np.concatenate(qgs).reshape(-1, 4)
    tg = np.concatenate(tgs).reshape(-1, 3)
    t_err = np.linalg.norm(t - tg, axis=-1)
    r_err = quat_angle_deg(q, qg)
    gt_mag = np.linalg.norm(tg, axis=-1)
    # least-squares scale: does the net predict systematically short/long?
    scale = float(np.sum(t * tg) / max(np.sum(tg * tg), 1e-9))
    return {
        "t_err_mean_m": float(t_err.mean()),
        "t_err_median_m": float(np.median(t_err)),
        "t_err_p90_m": float(np.percentile(t_err, 90)),
        "r_err_mean_deg": float(r_err.mean()),
        "gt_motion_mean_m": float(gt_mag.mean()),
        "rel_err_pct": float(100 * t_err.mean() / max(gt_mag.mean(), 1e-9)),
        "scale": scale,
        "n": int(len(t_err)),
        **rotation_bias_stats(q, qg),
        "per_axis": per_axis_rotation_stats(q, qg),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--root", default="/root/drive_data/dataset")
    ap.add_argument("--gt_dir", default="/root/drive_data/ground_truth_pose")
    ap.add_argument("--log_dir", default="/root/drive_data/log")
    ap.add_argument("--pretrained", default=None,
                    help="portable artifact to diagnose instead of the "
                         "latest checkpoint (the SELECTED model)")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import synthetic_drive as sd

    targs = argparse.Namespace(
        root=args.root, gt_dir=args.gt_dir, log_dir=args.log_dir,
        batch=args.batch, host_projection=True, quantized_transfer=True,
        lr_decay_step=50000, lr_decay_rate=0.7, bn_decay_step=50000,
    )
    trainer = sd._trainer(targs)
    if args.pretrained:
        meta = trainer.load_pretrained(args.pretrained)
        print(f"loaded artifact {args.pretrained} "
              f"(epochs={meta.get('trained_epochs')})", flush=True)
    else:
        trainer.restore()
        print(f"restored step {int(trainer.state.step)} "
              f"(epoch {trainer.start_epoch - 1})", flush=True)
    params = jax.device_get(trainer.state.params)
    stats = jax.device_get(trainer.state.batch_stats)

    report = {"step": int(trainer.state.step)}
    for seq, tag in [(1, "train_seq1_fast"), (4, "train_seq4"),
                     (6, "train_seq6"), (7, "eval_seq7"),
                     (10, "holdout_seq10"), (9, "holdout_seq9_fast")]:
        r = per_pair_stats(trainer.eval_step, params, stats,
                           trainer.dataset, seq, args.frames, args.batch)
        report[tag] = r
        print(f"{tag}: t_err {r['t_err_mean_m']:.4f} m "
              f"(median {r['t_err_median_m']:.4f}, p90 {r['t_err_p90_m']:.4f}) "
              f"r_err {r['r_err_mean_deg']:.3f} deg "
              f"motion {r['gt_motion_mean_m']:.3f} m "
              f"rel {r['rel_err_pct']:.1f}% scale {r['scale']:.4f}",
              flush=True)
        ax = r["per_axis"]
        print("  " + " | ".join(
            f"{n}: gt_std {ax[n]['gt_std_deg']:.3f} err_std "
            f"{ax[n]['err_std_deg']:.3f} bias {ax[n]['err_bias_deg']:+.4f} "
            f"slope {ax[n]['track_slope']:.2f}"
            for n in ("yaw", "pitch", "roll")), flush=True)

    # BN ablation: batch-stats BN (training=True path) with dropout disabled
    import dataclasses

    from efficientlo_net_tpu.models.pwclo import PWCLONet

    cfg0 = sd._model_cfg()
    cfg_nodrop = dataclasses.replace(cfg0, dropout_rate=0.0)
    model_bn = PWCLONet(cfg_nodrop)
    from efficientlo_net_tpu.training.step import _forward_inputs

    @jax.jit
    def eval_step_bnbatch(params, batch_stats, batch):
        p1, p2, q_gt, t_gt = _forward_inputs(batch, cfg0.sensor)
        out, _ = model_bn.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            p1, p2, training=True, bn_momentum=0.99, stochastic=False,
            rngs={"neighbor": jax.random.key(0),
                  "dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )
        return {"q": out["q"][0], "t": out["t"][0],
                "q_gt": q_gt, "t_gt": t_gt}

    r = per_pair_stats(eval_step_bnbatch, params, stats, trainer.dataset,
                       7, args.frames, args.batch)
    report["eval_seq7_bn_batchstats"] = r
    print(f"eval_seq7 with BATCH-stats BN: t_err {r['t_err_mean_m']:.4f} m "
          f"r_err {r['r_err_mean_deg']:.3f} deg rel {r['rel_err_pct']:.1f}% "
          f"scale {r['scale']:.4f}", flush=True)

    out_path = os.path.join(REPO, "docs", "accuracy_diagnosis.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
