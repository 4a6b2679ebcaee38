"""Headline benchmark: end-to-end LiDAR odometry inference throughput.

Measures raw scan pair (150k points each) -> cylindrical projection ->
PWCLO forward -> frame-to-frame pose, on one TPU chip, full HDL-64
configuration (64x1800, reference defaults).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

``vs_baseline`` divides by 12.5 frames/s — the TF1 reference publishes no
throughput (SURVEY.md §6); 0.08 s/frame is the order reported for this model
family (PWCLO-Net / EfficientLO-Net, arXiv 2111.02135) on the GPUs of the
reference's era, used here as the documented stand-in baseline.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the full jitted pipeline takes minutes to build
# through the remote-TPU toolchain on a cold cache, milliseconds warm
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FPS = 12.5
BATCH = 8
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from efficientlo_net_tpu.config import ModelConfig
    from efficientlo_net_tpu.data.synthetic import synthetic_pair
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops.projection import project_to_range_image

    cfg = ModelConfig()
    model = PWCLONet(cfg)
    h, w = cfg.sensor.height, cfg.sensor.width

    rng = np.random.default_rng(0)
    pairs = [synthetic_pair(rng, cfg.sensor) for _ in range(BATCH)]
    pc1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    pc2 = jnp.asarray(np.stack([p[1] for p in pairs]))

    p1, _ = project_to_range_image(pc1, None, h, w, cfg.sensor)
    p2, _ = project_to_range_image(pc2, None, h, w, cfg.sensor)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1[:1], p2[:1], training=False,
    )

    @jax.jit
    def infer(variables, pc1, pc2):
        i1, _ = project_to_range_image(pc1, None, h, w, cfg.sensor)
        i2, _ = project_to_range_image(pc2, None, h, w, cfg.sensor)
        out = model.apply(variables, i1, i2, training=False)
        return out["q"][0], out["t"][0]

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def chained(variables, pc1, pc2, n):
        # feed each iteration's pose back into the next iteration's input so
        # the device must execute them sequentially; one host fetch at the
        # end.  (A per-iteration host sync would measure the ~24 ms transport
        # round trip of the remote-TPU tunnel, not device throughput.)
        def body(carry, _):
            a, b = carry
            q, t = infer(variables, a, b)
            eps = (jnp.sum(q) + jnp.sum(t)) * 1e-12
            return (a + eps, b + eps), None

        (a, b), _ = jax.lax.scan(body, (pc1, pc2), None, length=n)
        return infer(variables, a, b)

    np.asarray(chained(variables, pc1, pc2, n=ITERS)[0])  # warmup + compile

    t0 = time.perf_counter()
    np.asarray(chained(variables, pc1, pc2, n=ITERS)[0])
    dt = time.perf_counter() - t0

    fps = BATCH * (ITERS + 1) / dt  # scan body runs ITERS times + final infer
    print(
        json.dumps(
            {
                "metric": "odometry_inference_throughput",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )
    print(
        f"batch={BATCH} iters={ITERS} total={dt:.3f}s "
        f"per-frame={1e3 * dt / (BATCH * ITERS):.3f}ms "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
