import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import tiny_model_config
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.ops.projection import project_to_range_image
from tests.test_model import make_batch

CFG32 = tiny_model_config()
CFG16 = dataclasses.replace(CFG32, compute_dtype="bfloat16")


def test_bf16_forward_close_to_f32():
    rng = np.random.default_rng(0)
    pc1, pc2, _ = make_batch(rng)
    h, w = CFG32.sensor.height, CFG32.sensor.width
    p1, _ = project_to_range_image(jnp.asarray(pc1), None, h, w, CFG32.sensor)
    p2, _ = project_to_range_image(jnp.asarray(pc2), None, h, w, CFG32.sensor)

    from tests.test_model import jit_eval_apply, jit_init

    m32, m16 = PWCLONet(CFG32), PWCLONet(CFG16)
    rngs = {"params": jax.random.key(0), "neighbor": jax.random.key(1),
            "dropout": jax.random.key(2)}
    v32 = jit_init(m32)(rngs, p1, p2, training=False)
    out32 = jit_eval_apply(m32)(v32, p1, p2)
    # same params work for the bf16 model (params stay f32; compute is bf16)
    out16 = jit_eval_apply(m16)(v32, p1, p2)

    for q32, q16, t32, t16 in zip(out32["q"], out16["q"], out32["t"], out16["t"]):
        assert q16.dtype == jnp.float32  # heads stay f32
        assert np.all(np.isfinite(np.asarray(q16)))
        # bf16 compute must stay in the same ballpark as f32
        assert float(jnp.max(jnp.abs(q16 - q32))) < 0.2
        assert float(jnp.max(jnp.abs(t16 - t32))) < 0.5
