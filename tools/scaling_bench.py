"""Data-parallel scaling benchmark: train-step throughput vs mesh size.

BASELINE config 4 harness ("large-batch multi-chip data-parallel training"):
run the sharded train step on meshes of 1..N devices with a proportionally
growing global batch (weak scaling) and report frames/s + efficiency.

On a real pod this measures ICI-gradient-reduction scaling; on a CPU host it
exercises the same SPMD program over virtual devices
(--xla_force_host_platform_device_count).

Usage: python tools/scaling_bench.py [--devices 1 2 4 8] [--per-device-batch 2]
       [--tiny] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--tiny", action="store_true", help="tiny model config")
    p.add_argument("--cpu", action="store_true", help="force CPU virtual devices")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--json", action="store_true",
                   help="write docs/scaling.{json,md} with the results")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(args.devices)}"
            ).strip()
        os.environ["ELO_NEIGHBOR_IMPL"] = "fast"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig, tiny_model_config
    from efficientlo_net_tpu.data.synthetic import synthetic_batch
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.parallel.data_parallel import (
        make_sharded_train_step,
        replicate_state,
    )
    from efficientlo_net_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from efficientlo_net_tpu.training.state import create_train_state

    cfg = tiny_model_config() if args.tiny else ModelConfig()
    model = PWCLONet(cfg)
    rng = np.random.default_rng(0)

    results, rows = {}, []
    for n in args.devices:
        devs = jax.devices()[:n]
        if len(devs) < n:
            print(f"skip n={n}: only {len(devs)} devices")
            continue
        bsz = n * args.per_device_batch
        tcfg = TrainConfig(batch_size=bsz)
        mesh = make_mesh(devs)
        state = replicate_state(
            create_train_state(model, cfg, tcfg, jax.random.key(0)), mesh
        )
        step = make_sharded_train_step(model, cfg, tcfg, mesh)
        batch = shard_batch(
            mesh,
            {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, bsz, cfg.sensor, training=True).items()},
        )
        key = jax.device_put(jax.random.key(1), replicated(mesh))

        state, m = step(state, batch, key)  # compile
        float(jax.device_get(m["loss"]))  # hard sync (axon's
        # block_until_ready returns before execution finishes)
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step(state, batch, key)
        _ = float(jax.device_get(m["loss"]))  # sync through the dependency
        dt = (time.perf_counter() - t0) / args.steps
        fps = bsz / dt
        results[n] = fps
        base = results[min(results)]
        eff = fps / (base * n / min(results)) * 100
        rows.append({"devices": n, "batch": bsz, "step_ms": round(dt * 1e3, 1),
                     "frames_per_s": round(fps, 1),
                     "efficiency_pct": round(eff, 1)})
        print(
            f"devices={n:2d} batch={bsz:3d} step={dt * 1e3:7.1f} ms "
            f"throughput={fps:8.1f} frames/s efficiency={eff:5.1f}%",
            flush=True,
        )

    if args.json and rows:
        import json

        docs = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
        )
        platform = jax.devices()[0].platform
        payload = {
            "platform": platform,
            "device_kind": jax.devices()[0].device_kind,
            "model": "tiny" if args.tiny else "full",
            "weak_scaling": rows,
            "note": (
                "virtual CPU devices exercise the identical SPMD program the "
                "TPU mesh would run (psum gradient reduction over the data "
                "axis); absolute throughput and efficiency are only "
                "meaningful on real multi-chip hardware"
                if platform == "cpu" else "real-device measurement"
            ),
        }
        with open(os.path.join(docs, "scaling.json"), "w") as f:
            json.dump(payload, f, indent=1)
        lines = [
            "# Data-parallel weak scaling",
            "",
            f"`tools/scaling_bench.py` — {payload['model']} config, "
            f"{args.per_device_batch} frames/device/step, "
            f"platform `{platform}` ({payload['device_kind']}).",
            "",
            "| devices | global batch | step (ms) | frames/s | efficiency |",
            "|---|---|---|---|---|",
        ] + [
            f"| {r['devices']} | {r['batch']} | {r['step_ms']} | "
            f"{r['frames_per_s']} | {r['efficiency_pct']}% |"
            for r in rows
        ] + ["", payload["note"] + "."]
        with open(os.path.join(docs, "scaling.md"), "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
