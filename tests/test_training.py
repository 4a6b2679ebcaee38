import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import TrainConfig, tiny_model_config
from efficientlo_net_tpu.data.synthetic import synthetic_batch
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.parallel.data_parallel import (
    make_sharded_train_step,
    replicate_state,
)
from efficientlo_net_tpu.parallel.mesh import make_mesh, shard_batch
from efficientlo_net_tpu.training.state import create_train_state
from efficientlo_net_tpu.training.step import make_eval_step, make_train_step

CFG = tiny_model_config()
TCFG = TrainConfig(batch_size=2)


def test_lr_and_bn_schedules():
    from efficientlo_net_tpu.training.state import bn_momentum_schedule, lr_schedule

    lr = lr_schedule(TCFG)
    np.testing.assert_allclose(float(lr(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lr(100000)), 1e-3 * 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(lr(10**9)), 1e-5, rtol=1e-6)  # floor
    bn = bn_momentum_schedule(TCFG)
    np.testing.assert_allclose(float(bn(0)), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(bn(10**9)), 0.99, rtol=1e-6)


def test_single_device_train_step_reduces_loss():
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    step = jax.jit(make_train_step(model, CFG, TCFG))

    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, 2, CFG.sensor, training=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 3
    # optimizing the same batch must make progress
    assert losses[-1] < losses[0]


def test_quantized_transfer_matches_float():
    """int16 point transfer (1.25 mm) must give the same loss to within the
    quantization noise floor and step identically in structure."""
    from efficientlo_net_tpu.data.loader import quantize_points

    model = PWCLONet(CFG)
    step = jax.jit(make_train_step(model, CFG, TCFG))

    rng = np.random.default_rng(2)
    host = synthetic_batch(rng, 2, CFG.sensor, training=True)
    batch_f = {k: jnp.asarray(v) for k, v in host.items()}
    batch_q = dict(
        host, pc1=quantize_points(host["pc1"]), pc2=quantize_points(host["pc2"])
    )
    # round-trip error bound: half an LSB
    np.testing.assert_allclose(
        np.asarray(batch_q["pc1"], np.float32) / 800.0, host["pc1"], atol=6.5e-4
    )
    batch_q = {k: jnp.asarray(v) for k, v in batch_q.items()}
    assert batch_q["pc1"].dtype == jnp.int16

    s_f, m_f = step(create_train_state(model, CFG, TCFG, jax.random.key(0)),
                    batch_f, jax.random.key(5))
    s_q, m_q = step(create_train_state(model, CFG, TCFG, jax.random.key(0)),
                    batch_q, jax.random.key(5))
    lf, lq = float(m_f["loss"]), float(m_q["loss"])
    assert np.isfinite(lq)
    assert abs(lf - lq) < 0.05 * max(1.0, abs(lf))


def test_data_parallel_matches_single_device():
    model = PWCLONet(CFG)
    mesh = make_mesh(jax.devices()[:4])
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))

    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, 4, CFG.sensor, training=False)

    # sharded step over 4 devices
    dp_state = replicate_state(state, mesh)
    dp_step = make_sharded_train_step(model, CFG, TCFG, mesh)
    dp_batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
    dp_state, dp_metrics = dp_step(dp_state, dp_batch, jax.random.key(9))

    # single-device step on the full batch
    sstate = create_train_state(model, CFG, TCFG, jax.random.key(0))
    sstep = jax.jit(make_train_step(model, CFG, TCFG))
    sstate, smetrics = sstep(
        sstate, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.key(9)
    )

    # loss must agree up to cross-device reduction rounding (BN batch stats
    # are reduced in a different order under GSPMD)
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(smetrics["loss"]), rtol=2e-4
    )
    assert int(dp_state.step) == 1

    # eval-mode forward (running BN stats, no cross-batch reductions) must be
    # numerically equivalent sharded vs unsharded.  (Recreate the state: the
    # sharded step donated the original buffers.)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    eval_step = make_eval_step(model, CFG)
    ref_out = eval_step(state.params, state.batch_stats,
                        {k: jnp.asarray(v) for k, v in batch.items()})
    dp_out = eval_step(
        jax.device_put(state.params, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
        jax.device_put(state.batch_stats, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
        shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()}),
    )
    np.testing.assert_allclose(
        np.asarray(dp_out["q"]), np.asarray(ref_out["q"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dp_out["t"]), np.asarray(ref_out["t"]), atol=1e-4
    )


def test_eval_step_outputs():
    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    eval_step = make_eval_step(model, CFG)
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, 2, CFG.sensor, training=False)
    out = eval_step(state.params, state.batch_stats,
                    {k: jnp.asarray(v) for k, v in batch.items()})
    assert out["q"].shape == (2, 4)
    assert out["t"].shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(out["q"])))


def test_streaming_eval_fns_match_pairwise_eval_step():
    """Pyramid-cached eval (encode once, correlate cached pyramids) must
    reproduce the pairwise eval_step exactly — eval towers are
    deterministic."""
    from efficientlo_net_tpu.training.step import make_streaming_eval_fns

    model = PWCLONet(CFG)
    state = create_train_state(model, CFG, TCFG, jax.random.key(0))
    eval_step = make_eval_step(model, CFG)
    encode, correlate = make_streaming_eval_fns(model, CFG)

    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, 2, CFG.sensor, training=False)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    ref = eval_step(state.params, state.batch_stats, jbatch)
    pyr1 = encode(state.params, state.batch_stats, jbatch["pc1"])
    pyr2 = encode(state.params, state.batch_stats, jbatch["pc2"])
    out = correlate(state.params, state.batch_stats, pyr1, pyr2)

    np.testing.assert_allclose(np.asarray(out["q"]), np.asarray(ref["q"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["t"]), np.asarray(ref["t"]),
                               atol=1e-6)
