"""Roofline / MFU accounting for the hot kernels (VERDICT r2 item 5).

For each hot stage — the Pallas neighbor-select at every level geometry,
the ConvMLP pyramid, the cost-volume/refinement remainder, the input
projection, and the train step — this measures device time (chained
on-device iterations, one host fetch) and pairs it with XLA's own HLO cost
model (``compiled.cost_analysis()``: flops + bytes accessed) to report

  * achieved GFLOP/s and GB/s,
  * the analytic time floor ``max(bytes/BW_peak, flops/FLOPS_peak)``,
  * ``% of roofline`` = floor / measured (100% = speed of light for that
    op's operational intensity on this chip).

Peaks are TPU v5e (v5 lite) public numbers: 197 TFLOP/s bf16 matmul and
819 GB/s HBM (jax-ml.github.io/scaling-book).  The compute path here is
float32 (docs/bf16_perf.md), for which the MXU sustains ~1/4 of the bf16
rate; both bounds are reported, but every stage in this network is
memory-bound (operational intensity far below the ~240 f32 FLOP/byte
ridge), so the HBM bound is the one that matters.

Caveat: XLA's cost model counts bytes at HLO level BEFORE fusion layout
decisions, so "bytes accessed" is an upper-ish estimate of HBM traffic
(fusion removes intermediate round trips; the model does account for fusion
regions at this granularity).  The % figures are therefore conservative
floors, same standard as docs/projection_perf.md.

Usage: python tools/roofline.py [--json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
# the axon client reports ~0s compile times (server-side compile), so any
# positive threshold silently disables persistence on the tunnel backend
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# TPU v5e public peaks
PEAK_HBM_BPS = 819e9
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 4.0  # MXU f32 rate

ROWS = []


def measure(name, fn, args, iters=20, note=""):
    """Time fn (chained scan) and pull flops/bytes from the compiled HLO."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(eps, _):
            out = fn(eps, *args)
            return jnp.sum(out) * 1e-20, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    # one un-chained compile for the cost analysis (the scan would count
    # n copies; analyzing the single-iteration program is the per-iter cost)
    single = jax.jit(lambda args: jnp.sum(fn(jnp.float32(0.0), *args)) * 1e-20)
    cost = single.lower(args).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    np.asarray(run(args, n=iters))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(args, n=iters))
    dt = (time.perf_counter() - t0) / iters

    t_mem = bytes_acc / PEAK_HBM_BPS
    t_f32 = flops / PEAK_F32_FLOPS
    floor = max(t_mem, t_f32)
    row = {
        "stage": name,
        "ms": round(1e3 * dt, 3),
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_acc / 1e9, 3),
        "intensity_flop_per_byte": round(flops / max(bytes_acc, 1.0), 2),
        "achieved_gflops_s": round(flops / dt / 1e9, 1),
        "achieved_gb_s": round(bytes_acc / dt / 1e9, 1),
        "pct_hbm_peak": round(100 * (bytes_acc / dt) / PEAK_HBM_BPS, 1),
        "pct_mxu_f32_peak": round(100 * (flops / dt) / PEAK_F32_FLOPS, 1),
        "bound": "memory" if t_mem >= t_f32 else "compute",
        "floor_ms": round(1e3 * floor, 3),
        "pct_of_roofline": round(100 * floor / dt, 1),
        "note": note,
    }
    ROWS.append(row)
    print(
        f"{name:32s} {row['ms']:8.3f} ms | {row['gbytes']:7.3f} GB "
        f"{row['gflops']:8.2f} GF | {row['achieved_gb_s']:6.1f} GB/s "
        f"({row['pct_hbm_peak']:4.1f}% HBM) | floor {row['floor_ms']:7.3f} ms "
        f"-> {row['pct_of_roofline']:5.1f}% of roofline [{row['bound']}]",
        flush=True,
    )
    return row


def select_analytic_bytes(b, h1, w1, h2, w2, kernel, k,
                          cstride=(1, 1), sstride=(1, 1)):
    """TRUE HBM bytes of one neighbor-select dispatch, derived from the
    actual Pallas BlockSpecs (ops/pallas_select.py) instead of the
    pre-fusion HLO cost model (VERDICT r4 next-6: the HLO count made the
    Pallas stages read as 193-469%% "of roofline").

    Traffic = the XLA prebuild (read source grid once, write the
    (B,3,kh,P,n_h,Wc) window tensor once) + the pallas_call (read the
    prebuilt tensor and the center block once each — the grid tiles map
    disjoint slices — and write the two (B,K,n_h,n_w) outputs)."""
    kh, kw = kernel
    csh, csw = cstride
    sh, sw = sstride
    n_h = -(-h1 // csh)
    n_w = -(-w1 // csw)
    pw = kw // 2
    wp = w2 + kw - 1  # wrap-padded width
    if sw > 1:
        p_count, wc = 1, wp * sw
    elif csw > 1:
        p_count = csw
        wc = -(-wp // csw)
    else:
        p_count, wc = 1, wp
    prebuilt = b * 3 * kh * p_count * n_h * wc * 4
    src_read = b * h2 * w2 * 3 * 4
    centers = b * 3 * n_h * n_w * 4
    outputs = 2 * b * k * n_h * n_w * 4
    return src_read + 2 * prebuilt + centers + outputs


def main():
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_pair
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops import neighbors as N
    from efficientlo_net_tpu.ops.projection import project_to_range_image

    cfg = ModelConfig()
    model = PWCLONet(cfg)
    h, w = cfg.sensor.height, cfg.sensor.width
    B = 8

    rng = np.random.default_rng(0)
    pairs = [synthetic_pair(rng, cfg.sensor) for _ in range(B)]
    pc1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    pc2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    p1, _ = project_to_range_image(pc1, None, h, w, cfg.sensor, method="packed")
    p2, _ = project_to_range_image(pc2, None, h, w, cfg.sensor, method="packed")
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1[:1], p2[:1], training=False,
    )

    # --- neighbor-select kernels (Pallas) at every network geometry --------
    # level grids are strided slices of the projection
    l0_1, l0_2 = p1[:, ::4, ::8], p2[:, ::4, ::8]                 # 16x225
    l1_1, l1_2 = l0_1[:, ::2, ::2], l0_2[:, ::2, ::2]             # 8x113
    l2_1, l2_2 = l1_1[:, ::2, ::2], l1_2[:, ::2, ::2]             # 4x57
    select_cases = [
        # (name, centers-from, sources, kernel, K, radius, cstride, mode)
        ("select_down_l0_9x15_k32", p1, p2, cfg.down_kernels[0],
         cfg.down_K[0], cfg.down_conv_dis[0], (4, 8), N.FIRST_K),
        ("select_down_l1_7x11_k32", l0_1, l0_2, cfg.down_kernels[1],
         cfg.down_K[1], cfg.down_conv_dis[1], (2, 2), N.FIRST_K),
        ("select_down_l2_5x9_k16", l1_1, l1_2, cfg.down_kernels[2],
         cfg.down_K[2], cfg.down_conv_dis[2], (2, 2), N.FIRST_K),
        ("select_cv_l0_11x41_knn6", l0_1, l0_2, cfg.cv_kernel2[0],
         cfg.cv_nsample_q[0], 1000.0, (1, 1), N.KNN),
        ("select_cv_l2_5x35_knn32", l2_1, l2_2, cfg.cv_kernel2[3],
         cfg.cv_nsample_q[3], 1000.0, (1, 1), N.KNN),
    ]
    for name, x1, x2, kernel, k, dist, cstride, mode in select_cases:
        def fn(eps, x1, x2, kernel=kernel, k=k, dist=dist, cstride=cstride,
               mode=mode):
            _, mask = N.select_neighbors(
                x1 + eps, x2, kernel, k, dist,
                center_stride=cstride, mode=mode, impl="pallas",
            )
            return mask
        row = measure(name, fn, (x1, x2))
        # analytic (BlockSpec-derived) HBM traffic -> defensible <=100%
        # roofline figures for the Pallas stages
        ab = select_analytic_bytes(
            x1.shape[0], x1.shape[1], x1.shape[2], x2.shape[1], x2.shape[2],
            kernel, k, cstride)
        row["analytic_gbytes"] = round(ab / 1e9, 4)
        row["analytic_floor_ms"] = round(ab / PEAK_HBM_BPS * 1e3, 4)
        row["analytic_pct_of_roofline"] = round(
            100.0 * row["analytic_floor_ms"] / row["ms"], 1)
        print(f"    analytic: {row['analytic_gbytes']:.4f} GB -> floor "
              f"{row['analytic_floor_ms']:.3f} ms = "
              f"{row['analytic_pct_of_roofline']:.1f}% of roofline "
              f"(launch/sequential-bound remainder)", flush=True)

    # --- projection, pyramid (the ConvMLP stacks), full forward ------------
    def proj(eps, pc):
        img, _ = project_to_range_image(pc + eps, None, h, w, cfg.sensor,
                                        method="packed")
        return img
    measure("projection_packed", proj, (pc1,))

    def pyramid(eps, p):
        feats = model.apply(variables, p + eps, False, 0.99, False,
                            method=model._pyramid)
        return feats[-1][1]
    measure("pyramid_4_down_convs", pyramid, (p1,),
            note="per-point ConvMLP stacks + masked maxpool, one frame")

    def fwd(eps, p1, p2):
        out = model.apply(variables, p1 + eps, p2, training=False)
        return out["q"][0]
    measure("forward_full", fwd, (p1, p2))

    # --- train step (fwd + bwd + adam) --------------------------------------
    from efficientlo_net_tpu.data.synthetic import synthetic_batch
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import make_train_step

    tcfg = TrainConfig(batch_size=B)
    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, B, cfg.sensor, training=True).items()}
    raw_step = make_train_step(model, cfg, tcfg)
    step = jax.jit(raw_step)

    cost = step.lower(state, batch, jax.random.key(0)).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    state2, _ = step(state, batch, jax.random.key(0))
    float(jax.device_get(state2.params["w_x"]))  # hard sync
    n = 10
    t0 = time.perf_counter()
    st = state2
    for i in range(n):
        st, m = step(st, batch, jax.random.fold_in(jax.random.key(1), i))
    float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    t_mem, t_f32 = bytes_acc / PEAK_HBM_BPS, flops / PEAK_F32_FLOPS
    floor = max(t_mem, t_f32)
    ROWS.append({
        "stage": "train_step", "ms": round(1e3 * dt, 3),
        "gflops": round(flops / 1e9, 2), "gbytes": round(bytes_acc / 1e9, 3),
        "intensity_flop_per_byte": round(flops / max(bytes_acc, 1.0), 2),
        "achieved_gflops_s": round(flops / dt / 1e9, 1),
        "achieved_gb_s": round(bytes_acc / dt / 1e9, 1),
        "pct_hbm_peak": round(100 * (bytes_acc / dt) / PEAK_HBM_BPS, 1),
        "pct_mxu_f32_peak": round(100 * (flops / dt) / PEAK_F32_FLOPS, 1),
        "bound": "memory" if t_mem >= t_f32 else "compute",
        "floor_ms": round(1e3 * floor, 3),
        "pct_of_roofline": round(100 * floor / dt, 1),
        "note": "fwd+bwd+adam, B=8, on-device input projections",
    })
    print(f"train_step {1e3 * dt:.2f} ms | {bytes_acc / 1e9:.2f} GB "
          f"{flops / 1e9:.1f} GF | floor {1e3 * floor:.2f} ms "
          f"({100 * floor / dt:.1f}% of roofline)", flush=True)

    if "--json" in sys.argv:
        payload = {
            "device": jax.devices()[0].device_kind,
            "peaks": {"hbm_gb_s": PEAK_HBM_BPS / 1e9,
                      "mxu_bf16_tflops": PEAK_BF16_FLOPS / 1e12,
                      "mxu_f32_tflops": PEAK_F32_FLOPS / 1e12},
            "method": "XLA compiled.cost_analysis() flops/bytes + chained "
                      "device timing; floor = max(bytes/BW, flops/peak)",
            "stages": ROWS,
        }
        # merge into docs/perf_breakdown.json under a 'roofline' key
        out = os.path.join(REPO, "docs", "perf_breakdown.json")
        data = {}
        if os.path.exists(out):
            with open(out) as f:
                data = json.load(f)
        data["roofline"] = payload
        with open(out, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote roofline section to {out}")


if __name__ == "__main__":
    main()
