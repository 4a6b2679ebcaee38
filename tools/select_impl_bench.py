"""Pallas vs XLA-"fast" neighbor-select at every network geometry (TPU).

VERDICT r4 next-6: the four coarse-grid selects are launch-bound in the
Pallas kernel (1.4-3.1 ms each at sub-4k centers); nobody had measured the
XLA roll-based formulation at those sizes on TPU.  This prints both and the
per-geometry winner, backing the "auto" dispatch heuristic.
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import ModelConfig
from efficientlo_net_tpu.ops import neighbors as N


def chain_timer(fn, args, iters=20):
    @partial(jax.jit, static_argnames=("n",))
    def run(args, n):
        def body(eps, _):
            out = fn(eps, *args)
            return jnp.sum(out) * 1e-20, None
        eps, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return eps

    np.asarray(run(args, n=iters))
    t0 = time.perf_counter()
    np.asarray(run(args, n=iters))
    return (time.perf_counter() - t0) / iters


def main():
    cfg = ModelConfig()
    b = 8
    rng = np.random.default_rng(0)
    shapes = cfg.level_shapes  # [pre1, pre2, l0, l1, l2, l3]

    def grid(h, w):
        g = rng.standard_normal((b, h, w, 3)).astype(np.float32)
        return jnp.asarray(g)

    p = grid(*shapes[1])
    l0 = grid(*shapes[2])
    l1 = grid(*shapes[3])
    l2 = grid(*shapes[4])

    cases = [
        ("select_down_l0_9x15_k32", p, p, cfg.down_kernels[0], cfg.down_K[0],
         cfg.down_conv_dis[0], (cfg.stride_h[2], cfg.stride_w[2]), N.FIRST_K),
        ("select_down_l1_7x11_k32", l0, l0, cfg.down_kernels[1],
         cfg.down_K[1], cfg.down_conv_dis[1],
         (cfg.stride_h[3], cfg.stride_w[3]), N.FIRST_K),
        ("select_down_l2_5x9_k16", l1, l1, cfg.down_kernels[2], cfg.down_K[2],
         cfg.down_conv_dis[2], (cfg.stride_h[4], cfg.stride_w[4]), N.FIRST_K),
        ("select_cv_l0_11x41_knn6", l0, l0, cfg.cv_kernel2[0],
         cfg.cv_nsample_q[0], 1e3, (1, 1), N.KNN),
        ("select_cv_l2_5x35_knn32", l2, l2, cfg.cv_kernel2[3],
         cfg.cv_nsample_q[3], 1e3, (1, 1), N.KNN),
    ]
    out = {}
    for name, x1, x2, kernel, k, dist, cstride, mode in cases:
        row = {}
        for impl in ("pallas", "fast"):
            def fn(eps, x1, x2, kernel=kernel, k=k, dist=dist,
                   cstride=cstride, mode=mode, impl=impl):
                _, mask = N.select_neighbors(
                    x1 + eps, x2, kernel, k, dist, center_stride=cstride,
                    mode=mode, impl=impl)
                return mask
            row[impl] = chain_timer(fn, (x1, x2)) * 1e3
        n_centers = (-(-x1.shape[1] // cstride[0])) * (-(-x1.shape[2] // cstride[1]))
        out[name] = row
        print(f"{name:28s} centers={n_centers:6d} "
              f"pallas {row['pallas']:7.3f} ms | fast {row['fast']:7.3f} ms "
              f"-> {'FAST' if row['fast'] < row['pallas'] else 'pallas'}",
              flush=True)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
