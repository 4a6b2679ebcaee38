"""Input-pipeline attribution: split the epoch-wall residue over the device
floor into decode / augment+project / host->device transfer / device step
(VERDICT r4 next-7: the ~19 s/epoch remainder was attributed to "decode +
transfer" without a measurement separating them).

Each stage is timed in isolation over the same batch stream:

  1. decode          — dataset[i] reads + pad (native threaded decode),
                       cold (cache off) and warm (RAM cache on);
  2. assemble        — make_batch on cached scans (stack + augmentation draw);
  3. augment_project — the fused native mirror->crop->SE(3)->project pass;
  4. quantize        — int16 transfer quantization;
  5. transfer        — jnp.asarray + block_until_ready of the quantized
                       host-projected batch through the tunnel;
  6. device_step     — chained train_step on a constant device batch
                       (the floor everything else must hide behind).

Run AFTER training finishes (stages 5/6 contend for the TPU).
Writes docs/perf_breakdown.json["input_pipeline"]["attribution"].

Run: python tools/pipeline_probe.py [--batches 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--root", default="/root/drive_data/dataset")
    ap.add_argument("--gt_dir", default="/root/drive_data/ground_truth_pose")
    args = ap.parse_args()

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.host_preprocess import augment_project_batch
    from efficientlo_net_tpu.data.kitti import SEQ_LENGTH_TABLE, OdometryDataset
    from efficientlo_net_tpu.data.loader import make_batch, quantize_points

    cfg = ModelConfig()
    b = args.batch
    nb = args.batches
    idxs = np.arange(SEQ_LENGTH_TABLE[3] + 1,
                     SEQ_LENGTH_TABLE[3] + 1 + nb * b)
    report = {"batch": b, "batches": nb}

    # 1. decode, cold vs warm
    ds_cold = OdometryDataset(args.root, num_points=cfg.sensor.num_points,
                              gt_pose_dir=args.gt_dir, cache_scans=False)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in idxs:
        ds_cold[int(i)]
    report["decode_cold_ms_per_batch"] = round(
        (time.perf_counter() - t0) / nb * 1e3, 1)

    ds = OdometryDataset(args.root, num_points=cfg.sensor.num_points,
                         gt_pose_dir=args.gt_dir, cache_scans=True)
    for i in idxs:
        ds[int(i)]  # populate the cache
    t0 = time.perf_counter()
    for i in idxs:
        ds[int(i)]
    report["decode_warm_ms_per_batch"] = round(
        (time.perf_counter() - t0) / nb * 1e3, 1)

    # 2-4. assemble -> fused augment+project -> quantize (warm cache)
    batches = []
    t_asm = t_proj = t_quant = 0.0
    for k in range(nb):
        sl = idxs[k * b:(k + 1) * b]
        t0 = time.perf_counter()
        raw = make_batch(ds, sl, rng, training=True, mirror_clouds=False)
        t_asm += time.perf_counter() - t0
        t0 = time.perf_counter()
        proj = augment_project_batch(raw, cfg.sensor)
        t_proj += time.perf_counter() - t0
        t0 = time.perf_counter()
        proj = dict(proj, p1=quantize_points(proj["p1"]),
                    p2=quantize_points(proj["p2"]))
        t_quant += time.perf_counter() - t0
        batches.append(proj)
    report["assemble_ms_per_batch"] = round(t_asm / nb * 1e3, 1)
    report["augment_project_ms_per_batch"] = round(t_proj / nb * 1e3, 1)
    report["quantize_ms_per_batch"] = round(t_quant / nb * 1e3, 1)

    # 5. host->device transfer of the quantized projected batch
    import jax
    import jax.numpy as jnp

    def put(batch):
        return {k: jnp.asarray(v) for k, v in batch.items()}

    jax.block_until_ready(put(batches[0]))  # warm the tunnel
    t0 = time.perf_counter()
    for batch in batches:
        jax.block_until_ready(put(batch))
    report["transfer_ms_per_batch"] = round(
        (time.perf_counter() - t0) / nb * 1e3, 1)
    bytes_per_batch = sum(np.asarray(v).nbytes for v in batches[0].values())
    report["transfer_mb_per_batch"] = round(bytes_per_batch / 2**20, 1)

    # 6. device step floor (chained, constant batch)
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import make_train_step

    from efficientlo_net_tpu.models.pwclo import PWCLONet

    tcfg = TrainConfig(batch_size=b, quantized_transfer=True,
                       host_projection=True)
    model = PWCLONet(cfg)
    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, cfg, tcfg, host_projected=True))
    dev_batch = put(batches[0])
    key = jax.random.key(1)
    state, _ = step(state, dev_batch, key)  # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, m = step(state, dev_batch, key)
        # the tunnel backend's block_until_ready is non-blocking (see
        # tools/microbench.py) — a real device_get is the only fence
        float(np.asarray(m["loss"]))
    report["device_step_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 1)

    # epoch projections at the synthetic-drive split size
    steps_per_epoch = 409
    host_ms = (report["decode_warm_ms_per_batch"]
               + report["assemble_ms_per_batch"]
               + report["augment_project_ms_per_batch"]
               + report["quantize_ms_per_batch"])
    report["epoch_floor_s_device_only"] = round(
        steps_per_epoch * report["device_step_ms"] / 1e3, 1)
    report["epoch_s_if_host_fully_hidden"] = round(
        steps_per_epoch * max(report["device_step_ms"],
                              host_ms / 4.0  # 4 loader workers
                              + report["transfer_ms_per_batch"]) / 1e3, 1)
    report["host_work_ms_per_batch_total"] = round(host_ms, 1)

    print(json.dumps(report, indent=1))
    path = os.path.join(REPO, "docs", "perf_breakdown.json")
    with open(path) as f:
        data = json.load(f)
    data.setdefault("input_pipeline", {})["attribution"] = report
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"merged into {path}")


if __name__ == "__main__":
    main()
