"""Device-time microbenchmarks (chained on-device execution, one host fetch).

Usage: python tools/microbench.py [projection|model|train|all]

The remote-TPU tunnel has a ~24 ms host round trip and a non-blocking
block_until_ready, so each benchmark chains N dependent iterations inside one
jitted scan and divides by N.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_timer(fn, args, iters=20):
    """fn: (carry_scalar, *args) -> scalar-dependent output; returns s/iter."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(eps, _):
            out = fn(eps, *args)
            return jnp.sum(out) * 1e-20, None

        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    np.asarray(run(args, n=iters))  # compile + warmup
    t0 = time.perf_counter()
    np.asarray(run(args, n=iters))
    return (time.perf_counter() - t0) / iters


RESULTS = {}  # stage name -> ms (filled by the bench_* functions)


def bench_projection():
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_pair
    from efficientlo_net_tpu.ops.projection import project_to_range_image

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    pc = jnp.asarray(np.stack([synthetic_pair(rng, cfg.sensor)[0] for _ in range(8)]))

    for method in ("packed", "sort", "scatter"):
        def fn(eps, pc, method=method):
            img, _ = project_to_range_image(pc + eps, None, 64, 1800, cfg.sensor, method)
            return img
        dt = chain_timer(fn, (pc,))
        RESULTS[f"projection_{method}_ms_per_cloud"] = round(1e3 * dt / 8, 3)
        print(f"projection[{method}] B=8 150k pts: {1e3 * dt:.2f} ms/iter "
              f"({1e3 * dt / 8:.3f} ms/cloud)")


def _model_setup():
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_pair
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops.projection import project_to_range_image

    cfg = ModelConfig()
    model = PWCLONet(cfg)
    rng = np.random.default_rng(0)
    pairs = [synthetic_pair(rng, cfg.sensor) for _ in range(8)]
    pc1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    pc2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    p1, _ = project_to_range_image(pc1, None, 64, 1800, cfg.sensor)
    p2, _ = project_to_range_image(pc2, None, 64, 1800, cfg.sensor)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1[:1], p2[:1], training=False,
    )
    return cfg, model, variables, pc1, pc2, p1, p2


def bench_model():
    cfg, model, variables, pc1, pc2, p1, p2 = _model_setup()

    def fwd(eps, p1, p2):
        out = model.apply(variables, p1 + eps, p2, training=False)
        return out["q"][0]

    dt = chain_timer(fwd, (p1, p2))
    RESULTS["forward_ms_per_frame"] = round(1e3 * dt / 8, 3)
    print(f"model forward (post-projection) B=8: {1e3 * dt:.2f} ms/iter "
          f"({1e3 * dt / 8:.3f} ms/frame)")


def bench_stages():
    """Per-stage forward breakdown: pyramid vs correlation/refinement.

    The pyramid (4 down_convs per frame over 64x1800 -> 4x29) is timed via
    the module method directly; the correlation + warp-refinement remainder
    is the full forward minus two pyramids.  Together with the projection
    stage this is the auditable top-level cost decomposition of a frame.
    """
    cfg, model, variables, pc1, pc2, p1, p2 = _model_setup()

    def pyramid(eps, p1):
        feats = model.apply(
            variables, p1 + eps, False, 0.99, False,
            method=model._pyramid,
        )
        return feats[-1][1]

    dt = chain_timer(pyramid, (p1,))
    RESULTS["pyramid_ms_per_frame"] = round(1e3 * dt / 8, 3)
    print(f"pyramid (4 down_convs) B=8: {1e3 * dt:.2f} ms/iter "
          f"({1e3 * dt / 8:.3f} ms/frame)")
    fwd = RESULTS.get("forward_ms_per_frame")
    if fwd:
        rem = fwd - 2 * RESULTS["pyramid_ms_per_frame"]
        RESULTS["correlation_refine_ms_per_frame"] = round(rem, 3)
        print(f"correlation+refinement (derived): {rem:.3f} ms/frame")


def bench_latency():
    """Single-scan (B=1) streaming latency: one projection + one forward.

    Live odometry runs at sensor rate with batch 1 — throughput at B=8 does
    not answer "can it keep up with a 10 Hz HDL-64"; this device-time number
    does (host-side transport excluded: the remote tunnel here adds ~24 ms
    that real deployments don't pay).
    """
    import jax.numpy as jnp

    from efficientlo_net_tpu.ops.projection import project_to_range_image

    cfg, model, variables, pc1, pc2, p1, p2 = _model_setup()
    h, w = cfg.sensor.height, cfg.sensor.width

    import jax

    prev_pyr = jax.jit(
        lambda v, p: model.apply(v, p, False, 0.99, False,
                                 method=model._pyramid)
    )(variables, p2[:1])

    def stream_step(eps, pts, prev):
        proj, _ = project_to_range_image(
            pts + eps, None, h, w, cfg.sensor, method="packed"
        )
        pyr = model.apply(
            variables, proj, False, 0.99, False, method=model._pyramid
        )
        out = model.apply(
            variables, pyr, prev, training=False,
            method=model.forward_from_pyramids,
        )
        return out["q"][0]

    dt = chain_timer(stream_step, (pc1[:1], prev_pyr))
    RESULTS["stream_latency_ms_b1"] = round(1e3 * dt, 3)
    hz = 1.0 / dt
    print(f"streaming step B=1 (project + one tower + correlate): "
          f"{1e3 * dt:.2f} ms ({hz:.0f} Hz; HDL-64 spins at 10 Hz)")


def bench_select():
    """Pallas vs pure-XLA ("fast") neighbor-select at the real network
    geometries — the framework's replacement for the reference's two CUDA
    ops (tf_ops/*), and the one place a hand-written TPU kernel competes
    with the compiler.  B=8, real projected validity patterns."""
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.ops import neighbors as N

    cfg = ModelConfig()
    _, _, _, _, _, p1, p2 = _model_setup()
    # the level grids ARE strided slices of the full-res projection
    l0_1, l0_2 = p1[:, ::4, ::8], p2[:, ::4, ::8]          # (8, 16, 225, 3)
    l2_1, l2_2 = l0_1[:, ::4, ::4][:, :4], l0_2[:, ::4, ::4][:, :4]  # 4x57

    cases = [
        # (name, xyz1, xyz2, kernel, k, dist, center_stride, mode)
        ("down_l0_9x15_k32", p1, p2, cfg.down_kernels[0], cfg.down_K[0],
         cfg.down_conv_dis[0], (4, 8), N.FIRST_K),
        ("cv_refine_l0_11x41_k6", l0_1, l0_2, cfg.cv_kernel2[0],
         cfg.cv_nsample_q[0], 1000.0, (1, 1), N.KNN),
        ("cv_coarse_l2_5x35_k32", l2_1, l2_2, cfg.cv_kernel2[3],
         cfg.cv_nsample_q[3], 1000.0, (1, 1), N.KNN),
    ]
    for name, x1, x2, kernel, k, dist, cstride, mode in cases:
        for impl in ("pallas", "fast"):
            def fn(eps, x1, x2, kernel=kernel, k=k, dist=dist,
                   cstride=cstride, mode=mode, impl=impl):
                _, mask = N.select_neighbors(
                    x1 + eps, x2, kernel, k, dist,
                    center_stride=cstride, mode=mode, impl=impl,
                )
                return mask

            dt = chain_timer(fn, (x1, x2))
            RESULTS[f"select_{name}_{impl}_us"] = round(1e6 * dt / 8, 1)
            print(f"select[{name}][{impl}] B=8: {1e3 * dt:.3f} ms/iter "
                  f"({1e6 * dt / 8:.1f} us/frame)")


def bench_train():
    import jax

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_batch
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.training.step import make_train_step
    import jax.numpy as jnp

    cfg = ModelConfig()
    tcfg = TrainConfig(batch_size=8)
    model = PWCLONet(cfg)
    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    step = jax.jit(make_train_step(model, cfg, tcfg))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, 8, cfg.sensor, training=True).items()}

    # chained: state feeds forward naturally
    state, _ = step(state, batch, jax.random.key(0))  # compile
    # hard sync: axon's block_until_ready returns before execution finishes
    import numpy as _np
    _np.asarray(jax.device_get(state.params["w_x"]))
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = step(state, batch, jax.random.key(i))
    loss = float(jax.device_get(metrics["loss"]))  # sync via dependency
    dt = (time.perf_counter() - t0) / n
    RESULTS["train_step_ms"] = round(1e3 * dt, 3)
    print(f"train step B=8: {1e3 * dt:.2f} ms/step ({1e3 * dt / 8:.3f} ms/frame), "
          f"loss={loss:.3f}")

    # host-projected variant (data/host_preprocess.py): device step consumes
    # pre-projected images; measures what moving the scatter-bound input
    # projections to the host buys the TensorCore
    from efficientlo_net_tpu.training.step import _forward_inputs

    p1, p2, _, _ = jax.jit(
        lambda b: _forward_inputs(b, cfg.sensor)
    )(batch)
    proj_batch = {
        "p1": p1, "p2": p2, "T_gt": batch["T_gt"],
        "T_trans": batch["T_trans"], "T_trans_inv": batch["T_trans_inv"],
        "aug_frame": batch["aug_frame"],
    }
    step_p = jax.jit(make_train_step(model, cfg, tcfg, host_projected=True))
    state_p = create_train_state(model, cfg, tcfg, jax.random.key(0))
    state_p, m = step_p(state_p, proj_batch, jax.random.key(0))
    float(jax.device_get(m["loss"]))  # hard sync
    t0 = time.perf_counter()
    for i in range(n):
        state_p, m = step_p(state_p, proj_batch, jax.random.key(i))
    loss = float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    RESULTS["train_step_host_projected_ms"] = round(1e3 * dt, 3)
    print(f"train step (host-projected inputs) B=8: {1e3 * dt:.2f} ms/step "
          f"({1e3 * dt / 8:.3f} ms/frame), loss={loss:.3f}")


if __name__ == "__main__":
    import json

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    what = args[0] if args else "all"
    if what in ("projection", "all"):
        bench_projection()
    if what in ("model", "all"):
        bench_model()
    if what in ("stages", "all"):
        bench_stages()
    if what in ("latency", "all"):
        bench_latency()
    if what in ("select", "all"):
        bench_select()
    if what in ("train", "all"):
        bench_train()
    if "--json" in sys.argv:
        import jax

        RESULTS["device"] = jax.devices()[0].device_kind
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "perf_breakdown.json",
        )
        with open(out, "w") as f:
            json.dump(RESULTS, f, indent=1)
        print(f"wrote {out}: {json.dumps(RESULTS)}")
