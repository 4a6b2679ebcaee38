"""Measure W-axis ring sharding on the virtual CPU mesh (VERDICT r2 item 7).

Times the full-res level-0 select+group (9x15 window, K=32, stride (4,8),
W=1800) and the full forward, ring-sharded at R in {3, 5} vs replicated
(the l0 center grid is 225 columns wide, so valid full-res ring sizes are
divisors of 225 — {3, 5, 9, 15, ...}; R=2/4 split W=1800 but not the
center grid, and the guard rejects them by design),
on `--xla_force_host_platform_device_count` CPU devices.  CPU wall-clock is
a *work-split* proxy only (virtual devices share 4 cores and ppermute is a
memcpy, not ICI), so the table pairs each measurement with the analytic
halo overhead (extra columns processed) and the ICI bytes per exchange that
a real TPU ring would pay.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=5 \
           python tools/ring_bench.py [--json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=5"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache_cpu")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np

RESULTS = {}


def timed(fn, *args, iters=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


import jax  # noqa: E402  (after env setup)
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    jax.config.update("jax_platforms", "cpu")
    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_pair
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops import neighbors as N
    from efficientlo_net_tpu.ops.projection import project_to_range_image
    from efficientlo_net_tpu.parallel.ring import ring_select_and_group

    cfg = ModelConfig()
    h, w = cfg.sensor.height, cfg.sensor.width
    B = 2  # small batch: the interesting axis is W, not B
    rng = np.random.default_rng(0)
    pairs = [synthetic_pair(rng, cfg.sensor) for _ in range(B)]
    pc1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    p1, _ = project_to_range_image(pc1, None, h, w, cfg.sensor, method="packed")
    feats = p1  # xyz as 3-channel features, matches the level-0 front end

    kernel, k, dist, cstride = (
        cfg.down_kernels[0], cfg.down_K[0], cfg.down_conv_dis[0], (4, 8)
    )
    kw = kernel[1]
    halo = kw // 2

    # replicated baseline (single device, the production unsharded op)
    base = jax.jit(
        lambda x, f: N.select_and_group(
            x, f, kernel, k, dist, center_stride=cstride, mode=N.FIRST_K,
        )
    )
    dt0 = timed(base, p1, feats)
    RESULTS["select_l0_replicated_ms"] = round(1e3 * dt0, 2)
    print(f"level-0 select+group replicated: {1e3 * dt0:.2f} ms", flush=True)

    devices = jax.devices()
    for r in (3, 5):
        if len(devices) < r:
            print(f"R={r}: not enough devices, skipping")
            continue
        mesh = Mesh(np.array(devices[:r]), ("ring",))
        shard = NamedSharding(mesh, P(None, None, "ring", None))
        p1_s = jax.device_put(p1, shard)
        f_s = jax.device_put(feats, shard)
        ring = jax.jit(
            partial(
                ring_select_and_group, kernel_size=kernel, k=k,
                distance=dist, mesh=mesh, center_stride=cstride,
                mode=N.FIRST_K,
            )
        )
        dt = timed(ring, p1_s, f_s)
        sector = w // r
        overhead = 2 * halo / sector
        RESULTS[f"select_l0_ring{r}_ms"] = round(1e3 * dt, 2)
        RESULTS[f"select_l0_ring{r}_halo_overhead_pct"] = round(100 * overhead, 2)
        # per-exchange ICI bytes on a real ring: 2 directions x halo columns
        # x H x (3+C) channels x 4 bytes x B
        ici_bytes = 2 * halo * h * (3 + feats.shape[-1]) * 4 * B
        RESULTS[f"select_l0_ring{r}_ici_kb_per_exchange"] = round(ici_bytes / 1e3, 1)
        print(
            f"level-0 select+group ring R={r}: {1e3 * dt:.2f} ms "
            f"(halo {halo} cols = {100 * overhead:.1f}% extra work, "
            f"{ici_bytes / 1e3:.0f} KB/exchange on ICI)", flush=True,
        )

    # full forward: replicated vs ring-sharded level-0 (the model's
    # integration point, PWCLONet(ring_mesh=...))
    model = PWCLONet(cfg)
    p2, _ = project_to_range_image(
        jnp.asarray(np.stack([p[1] for p in pairs])), None, h, w, cfg.sensor,
        method="packed",
    )
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1[:1], p2[:1], training=False,
    )
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, training=False)["q"][0])
    dtf = timed(fwd, variables, p1, p2, iters=3)
    RESULTS["forward_replicated_ms"] = round(1e3 * dtf, 2)
    print(f"full forward replicated: {1e3 * dtf:.2f} ms", flush=True)

    for r in (3, 5):
        if len(devices) < r:
            continue
        mesh = Mesh(np.array(devices[:r]).reshape(1, r), ("data", "ring"))
        fwd_r = jax.jit(
            lambda v, a, b, m=mesh: model.apply(
                v, a, b, training=False, ring_mesh=m
            )["q"][0]
        )
        shard = NamedSharding(mesh, P(None, None, "ring", None))
        p1_s = jax.device_put(p1, shard)
        p2_s = jax.device_put(p2, shard)
        dtr = timed(fwd_r, variables, p1_s, p2_s, iters=3)
        RESULTS[f"forward_ring{r}_ms"] = round(1e3 * dtr, 2)
        print(f"full forward ring R={r} (level-0 sharded): {1e3 * dtr:.2f} ms",
              flush=True)

    RESULTS["note"] = (
        "virtual CPU mesh on 4 shared cores: wall-clock shows work-split "
        "behavior, not ICI speedup; halo overhead and ICI bytes are the "
        "hardware-transferable numbers"
    )
    if "--json" in sys.argv:
        out = os.path.join(REPO, "docs", "ring_bench.json")
        with open(out, "w") as f:
            json.dump(RESULTS, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
