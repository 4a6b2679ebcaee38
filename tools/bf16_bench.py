"""Measure the bfloat16 compute path vs float32 at full resolution on TPU.

The model already supports ``ModelConfig(compute_dtype="bfloat16")`` (MLP
stacks in bf16; BN statistics, softmaxes, and pose heads stay f32 —
models/layers.py). This harness makes the decision auditable: device time for
forward and train step in both dtypes, plus the pose-output delta between
them on the same parameters (params are f32 either way, so the comparison is
apples-to-apples).

Usage: python tools/bf16_bench.py [--json]
Writes docs/bf16_perf.json with {f32,bf16} x {forward_ms, train_ms} and the
max |Δq|, |Δt| at the finest level.
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

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

BATCH = 8
ITERS = 20


def chain_timer(fn, args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(eps, _):
            out = fn(eps, *args)
            return jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    np.asarray(run(args, n=iters))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(args, n=iters))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_batch, synthetic_pair
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops.projection import project_to_range_image
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import make_train_step

    cfg32 = ModelConfig()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    h, w = cfg32.sensor.height, cfg32.sensor.width

    rng = np.random.default_rng(0)
    pairs = [synthetic_pair(rng, cfg32.sensor) for _ in range(BATCH)]
    pc1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    pc2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    p1, _ = project_to_range_image(pc1, None, h, w, cfg32.sensor, method="packed")
    p2, _ = project_to_range_image(pc2, None, h, w, cfg32.sensor, method="packed")

    results = {}
    m32, m16 = PWCLONet(cfg32), PWCLONet(cfg16)
    variables = jax.jit(m32.init, static_argnames=("training",))(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1[:1], p2[:1], training=False,
    )

    outs = {}
    for tag, model in (("f32", m32), ("bf16", m16)):
        def fwd(eps, p1, p2, model=model):
            out = model.apply(variables, p1 + eps, p2, training=False)
            return out["q"][0]

        dt = chain_timer(fwd, (p1, p2))
        results[f"forward_{tag}_ms_per_frame"] = round(1e3 * dt / BATCH, 3)
        print(f"forward[{tag}] B={BATCH}: {1e3 * dt:.2f} ms/iter "
              f"({1e3 * dt / BATCH:.3f} ms/frame)")
        o = jax.jit(partial(model.apply, training=False))(variables, p1, p2)
        outs[tag] = jax.device_get((o["q"][0], o["t"][0]))

    dq = float(np.max(np.abs(outs["f32"][0] - outs["bf16"][0])))
    dt_ = float(np.max(np.abs(outs["f32"][1] - outs["bf16"][1])))
    results["max_abs_dq_l0"] = round(dq, 5)
    results["max_abs_dt_l0"] = round(dt_, 5)
    print(f"pose delta bf16 vs f32 (same params): |dq|={dq:.5f} |dt|={dt_:.5f}")

    # --- train step -------------------------------------------------------
    rng = np.random.default_rng(1)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, BATCH, cfg32.sensor, training=True).items()}
    for tag, mcfg, model in (("f32", cfg32, m32), ("bf16", cfg16, m16)):
        tcfg = TrainConfig(batch_size=BATCH)
        state = create_train_state(model, mcfg, tcfg, jax.random.key(0))
        step = jax.jit(make_train_step(model, mcfg, tcfg), donate_argnums=(0,))
        key = jax.random.key(2)
        state, metrics = step(state, batch, key)
        float(jax.device_get(metrics["loss"]))  # hard sync (axon's
        # block_until_ready returns before execution finishes)
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            state, metrics = step(state, batch, jax.random.fold_in(key, i))
        loss = float(jax.device_get(metrics["loss"]))
        dt = (time.perf_counter() - t0) / n
        results[f"train_{tag}_ms_per_step"] = round(1e3 * dt, 2)
        print(f"train[{tag}] B={BATCH}: {1e3 * dt:.2f} ms/step (loss={loss:.3f})")

    results["device"] = jax.devices()[0].device_kind
    if "--json" in sys.argv:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "bf16_perf.json",
        )
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
