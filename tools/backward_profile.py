"""Training-step backward profile (VERDICT r2 item 4).

Splits the train step into measured pieces on the real chip:

  * ``loss_fwd``   — train-mode forward + loss only (BN updates, dropout,
                     stochastic neighbor order — everything but the grad),
  * ``value_grad`` — forward + backward (no optimizer),
  * ``full_step``  — value_and_grad + adam + state update (the shipped step),

for both the on-device-projection and host-projected input pipelines, and
pairs each with XLA's HLO cost model (flops / bytes accessed) to say whether
the backward is memory-bound (floor = bytes / 819 GB/s on v5e) or has
schedule slack worth attacking.

Writes a ``backward_profile`` section into docs/perf_breakdown.json.

Usage: python tools/backward_profile.py [--json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
# the axon client reports ~0s compile times (server-side compile), so any
# positive threshold silently disables persistence on the tunnel backend
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

PEAK_HBM_BPS = 819e9
PEAK_F32_FLOPS = 197e12 / 4.0

ROWS = []
B = 8


def cost_of(lowered):
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def record(name, dt, flops, bytes_acc, note=""):
    t_mem = bytes_acc / PEAK_HBM_BPS
    t_f32 = flops / PEAK_F32_FLOPS
    floor = max(t_mem, t_f32)
    row = {
        "stage": name,
        "ms": round(1e3 * dt, 2),
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(bytes_acc / 1e9, 2),
        "achieved_gb_s": round(bytes_acc / dt / 1e9, 1),
        "pct_hbm_peak": round(100 * (bytes_acc / dt) / PEAK_HBM_BPS, 1),
        "floor_ms": round(1e3 * floor, 2),
        "pct_of_roofline": round(100 * floor / dt, 1),
        "bound": "memory" if t_mem >= t_f32 else "compute",
        "note": note,
    }
    ROWS.append(row)
    print(
        f"{name:28s} {row['ms']:8.2f} ms | {row['gbytes']:6.2f} GB "
        f"{row['gflops']:8.1f} GF | {row['achieved_gb_s']:6.1f} GB/s "
        f"({row['pct_hbm_peak']:4.1f}% HBM) | floor {row['floor_ms']:7.2f} ms "
        f"-> {row['pct_of_roofline']:5.1f}% [{row['bound']}]",
        flush=True,
    )
    return row


def bench_loop(fn, args, sync, n=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_batch
    from efficientlo_net_tpu.models.losses import total_loss
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import (
        _forward_inputs,
        make_train_step,
    )

    cfg = ModelConfig()
    tcfg = TrainConfig(batch_size=B)
    model = PWCLONet(cfg)
    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, B, cfg.sensor, training=True).items()}
    key = jax.random.key(3)

    p1d, p2d, q_gt, t_gt = jax.jit(lambda b: _forward_inputs(b, cfg.sensor))(batch)
    proj_batch = {
        "p1": p1d, "p2": p2d, "T_gt": batch["T_gt"],
        "T_trans": batch["T_trans"], "T_trans_inv": batch["T_trans_inv"],
        "aug_frame": batch["aug_frame"],
    }

    def loss_fn(params, batch_stats, p1, p2, q_gt, t_gt, rng):
        rngs = {"neighbor": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1)}
        out, mutated = model.apply(
            {"params": params["model"], "batch_stats": batch_stats},
            p1, p2, training=True, bn_momentum=0.9, stochastic=True,
            rngs=rngs, mutable=["batch_stats"],
        )
        loss, metrics = total_loss(out, q_gt, t_gt, params["w_x"], params["w_q"])
        return loss, (mutated["batch_stats"], metrics)

    params, stats = state.params, state.batch_stats

    # --- train-mode forward + loss only -------------------------------------
    fwd = jax.jit(lambda p, s, a, b: loss_fn(p, s, a, b, q_gt, t_gt, key)[0])
    fl, by = cost_of(fwd.lower(params, stats, p1d, p2d))
    dt = bench_loop(
        lambda a, b: fwd(params, stats, a, b), (p1d, p2d),
        lambda o: float(jax.device_get(o)),
    )
    record("loss_fwd_trainmode", dt, fl, by,
           "forward+loss, BN batch stats, dropout, no grad")

    # --- forward + backward (no optimizer) ----------------------------------
    vg = jax.jit(
        lambda p, s, a, b: jax.value_and_grad(
            lambda pp: loss_fn(pp, s, a, b, q_gt, t_gt, key)[0]
        )(p)
    )
    fl_g, by_g = cost_of(vg.lower(params, stats, p1d, p2d))
    dt_g = bench_loop(
        lambda a, b: vg(params, stats, a, b), (p1d, p2d),
        lambda o: float(jax.device_get(o[0])),
    )
    record("value_and_grad", dt_g, fl_g, by_g,
           "fwd+bwd, host-projected inputs, no optimizer")

    # --- full shipped steps --------------------------------------------------
    for host_projected, bname, bb in (
        (False, "full_step_device_proj", batch),
        (True, "full_step_host_proj", proj_batch),
    ):
        step = jax.jit(make_train_step(model, cfg, tcfg,
                                       host_projected=host_projected))
        fl_s, by_s = cost_of(step.lower(state, bb, key))
        st, m = step(state, bb, key)  # compile + warm
        float(jax.device_get(m["loss"]))
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            st, m = step(st, bb, jax.random.fold_in(key, i))
        float(jax.device_get(m["loss"]))
        dt_s = (time.perf_counter() - t0) / n
        record(bname, dt_s, fl_s, by_s,
               "value_and_grad + adam + state update (shipped)")

    # derived: backward-only cost
    fwd_row = next(r for r in ROWS if r["stage"] == "loss_fwd_trainmode")
    vg_row = next(r for r in ROWS if r["stage"] == "value_and_grad")
    ROWS.append({
        "stage": "backward_derived",
        "ms": round(vg_row["ms"] - fwd_row["ms"], 2),
        "gbytes": round(vg_row["gbytes"] - fwd_row["gbytes"], 2),
        "gflops": round(vg_row["gflops"] - fwd_row["gflops"], 1),
        "note": "value_and_grad minus train-mode forward",
    })
    print(f"backward (derived): {ROWS[-1]['ms']:.2f} ms, "
          f"{ROWS[-1]['gbytes']:.2f} GB, {ROWS[-1]['gflops']:.1f} GF",
          flush=True)

    if "--json" in sys.argv:
        import jax as _jax

        out = os.path.join(REPO, "docs", "perf_breakdown.json")
        data = {}
        if os.path.exists(out):
            with open(out) as f:
                data = json.load(f)
        data["backward_profile"] = {
            "device": _jax.devices()[0].device_kind,
            "batch": B,
            "stages": ROWS,
        }
        with open(out, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote backward_profile section to {out}")


if __name__ == "__main__":
    main()
