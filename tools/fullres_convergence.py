"""Full-resolution convergence evidence on real TPU hardware (VERDICT r1
item 1b): train the flagship 64x1800 / 150k-point model for a few hundred
steps on synthetic rigid motion and verify pose recovery on unseen pairs.

Writes docs/fullres_convergence.md (loss curve + held-out pose errors) and
docs/fullres_convergence.json (machine-readable).

Run: python tools/fullres_convergence.py [--steps 400] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
# the axon client reports ~0s compile times (server-side compile), so any
# positive threshold silently disables persistence on the tunnel backend
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval_pairs", type=int, default=8)
    ap.add_argument(
        "--host_projection", action="store_true",
        help="crop/augment/project batches on the host workers "
             "(data/host_preprocess.py); the device step consumes images",
    )
    ap.add_argument(
        "--quantized_transfer", action="store_true",
        help="ship batches as int16 (1.25 mm LSB): halves both the tunnel "
             "bandwidth and the axon client's per-transfer host leak",
    )
    ap.add_argument(
        "--ckpt_dir", default=None,
        help="chunked execution: save/resume state here — the axon client "
             "leaks host memory per transfer (docs/axon_transfer_leak.md), "
             "so long runs execute as several fresh processes",
    )
    ap.add_argument(
        "--chunk", type=int, default=0,
        help="with --ckpt_dir: exit (after saving) once this many steps ran "
             "in this process; rerun the same command to continue",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_batch
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import (
        identity_batch_fields,
        make_eval_step,
        make_train_step,
    )

    cfg = ModelConfig()
    # synthetic motions are small; a gentler lr than the KITTI schedule
    tcfg = TrainConfig(batch_size=args.batch, base_learning_rate=1e-3)
    model = PWCLONet(cfg)
    print(f"device: {jax.devices()[0].device_kind}; full-res "
          f"{cfg.sensor.height}x{cfg.sensor.width}, "
          f"N={cfg.sensor.num_points}, B={args.batch}", flush=True)

    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    train_step = jax.jit(
        make_train_step(model, cfg, tcfg,
                        host_projected=args.host_projection),
        donate_argnums=(0,),
    )
    eval_step = make_eval_step(model, cfg)

    key = jax.random.key(1)

    start_step, curve, wall_prev = 0, [], 0.0
    mgr = None
    if args.ckpt_dir:
        from efficientlo_net_tpu.training.checkpoint import CheckpointManager

        ckpt_dir = os.path.abspath(args.ckpt_dir)
        mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
        curve_file = os.path.join(ckpt_dir, "conv_curve.json")
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            start_step = int(np.asarray(state.step))
            if os.path.exists(curve_file):
                saved = json.load(open(curve_file))
                curve, wall_prev = saved["curve"], saved["wall_s"]
            print(f"resumed at step {start_step}", flush=True)
    end_step = (
        min(args.steps, start_step + args.chunk) if args.chunk else args.steps
    )

    # Batch generation costs ~225 ms on this host (150k pts x B=8) vs a
    # ~110 ms device step — prefetch batches on worker threads so the long
    # runs are device-bound, not host-bound.  Per-step RNG streams are
    # independent (seeded by step index) so worker count doesn't change data.
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=4)
    stop = threading.Event()
    next_step = iter(range(start_step, end_step))
    step_lock = threading.Lock()

    def producer():
        while not stop.is_set():
            with step_lock:
                i = next(next_step, None)
            if i is None:
                return
            b = synthetic_batch(
                np.random.default_rng(i), args.batch, cfg.sensor, training=True
            )
            if args.host_projection:
                from efficientlo_net_tpu.data.host_preprocess import (
                    augment_project_batch,
                )

                b = augment_project_batch(b, cfg.sensor)
            if args.quantized_transfer:
                from efficientlo_net_tpu.data.loader import quantize_points

                for k in ("pc1", "pc2", "p1", "p2"):
                    if k in b:
                        b[k] = quantize_points(b[k])
            q.put((i, b))

    workers = [threading.Thread(target=producer, daemon=True) for _ in range(3)]
    for w in workers:
        w.start()

    pending = {}
    t0 = time.time()
    for step_i in range(start_step, end_step):
        while step_i not in pending:
            i, b = q.get()
            pending[i] = b
        batch = {k: jnp.asarray(v) for k, v in pending.pop(step_i).items()}
        state, metrics = train_step(state, batch, jax.random.fold_in(key, step_i))
        if step_i % 20 == 0 or step_i == args.steps - 1:
            loss = float(jax.device_get(metrics["loss"]))
            curve.append({"step": step_i, "loss": round(loss, 4)})
            print(f"step {step_i:4d} loss {loss:9.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    if mgr is not None:
        mgr.save(state)
        with open(curve_file, "w") as f:
            json.dump(
                {"curve": curve, "wall_s": wall_prev + time.time() - t0}, f
            )
    if end_step < args.steps:
        print(f"chunk done: {end_step}/{args.steps} steps "
              f"(rerun to continue)", flush=True)
        return 0

    # held-out evaluation: unseen pairs, eval mode (no aug, BN stats)
    eval_rng = np.random.default_rng(12345)
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    t_errs, r_errs = [], []
    for _ in range(args.eval_pairs // args.batch + 1):
        eb = synthetic_batch(eval_rng, args.batch, cfg.sensor, training=False)
        eb.update(identity_batch_fields(args.batch))
        out = eval_step(params, stats, {k: jnp.asarray(v) for k, v in eb.items()})
        q = np.asarray(out["q"]).reshape(args.batch, -1)   # (B, 4)
        t = np.asarray(out["t"]).reshape(args.batch, -1)   # (B, 3)
        q_gt = np.asarray(out["q_gt"]).reshape(args.batch, -1)
        t_gt = np.asarray(out["t_gt"]).reshape(args.batch, -1)
        t_errs.extend(np.linalg.norm(t - t_gt, axis=-1).tolist())
        # rotation geodesic angle between unit quaternions
        dots = np.abs(np.sum(q / np.linalg.norm(q, axis=-1, keepdims=True) * q_gt, axis=-1))
        r_errs.extend((2 * np.arccos(np.clip(dots, -1, 1))).tolist())

    t_err = float(np.mean(t_errs))
    r_err = float(np.degrees(np.mean(r_errs)))
    wall = wall_prev + time.time() - t0
    result = {
        "device": jax.devices()[0].device_kind,
        "resolution": [cfg.sensor.height, cfg.sensor.width],
        "num_points": cfg.sensor.num_points,
        "batch": args.batch,
        "steps": args.steps,
        "wall_s": round(wall, 1),
        "loss_curve": curve,
        "holdout_t_err_m": round(t_err, 4),
        "holdout_r_err_deg": round(r_err, 4),
        "motion_scale": "t in [0.5, 1.5] m forward, yaw +-0.02 rad",
    }
    docs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )
    # never let a short smoke run clobber longer-run evidence
    json_path = os.path.join(docs, "fullres_convergence.json")
    if os.path.exists(json_path):
        with open(json_path) as f:
            prev_steps = json.load(f).get("steps", 0)
        if prev_steps > args.steps:
            print(
                f"existing evidence covers {prev_steps} steps > {args.steps};"
                " not overwriting docs (pass more --steps to supersede)"
            )
            print(json.dumps(
                {"holdout_t_err_m": t_err, "holdout_r_err_deg": r_err}
            ))
            ok = curve[-1]["loss"] < curve[0]["loss"] and t_err < 0.5
            print("CONVERGENCE", "PASS" if ok else "FAIL")
            return 0 if ok else 1
    with open(json_path, "w") as f:
        json.dump(result, f, indent=1)

    lines = [
        "# Full-resolution convergence on TPU",
        "",
        "Generated by `tools/fullres_convergence.py` — the flagship",
        f"{cfg.sensor.height}x{cfg.sensor.width} / {cfg.sensor.num_points}-point "
        f"model trained {args.steps} steps (B={args.batch}) on synthetic rigid",
        f"motion, on one {result['device']} ({wall:.0f}s wall).",
        "",
        "| step | loss |",
        "|---|---|",
    ] + [f"| {c['step']} | {c['loss']} |" for c in curve] + [
        "",
        f"Held-out (unseen pairs, eval mode): translation error "
        f"**{t_err:.3f} m** (motions 0.5-1.5 m), rotation error "
        f"**{r_err:.2f} deg**.",
    ]
    with open(os.path.join(docs, "fullres_convergence.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"holdout_t_err_m": t_err, "holdout_r_err_deg": r_err}))
    ok = curve[-1]["loss"] < curve[0]["loss"] and t_err < 0.5
    print("CONVERGENCE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
