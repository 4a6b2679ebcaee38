"""Serving export: StableHLO serialization round trip of the full inference
function (projection + forward, weights as constants)."""

import numpy as np
import jax
import pytest

from efficientlo_net_tpu.config import tiny_model_config
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.serving.export import (
    export_odometry,
    load_odometry,
    make_infer_fn,
    save_artifact,
)
from tests.test_model import synthetic_scan


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_model_config()
    model = PWCLONet(cfg)
    rng = np.random.default_rng(0)
    pc1 = np.stack([synthetic_scan(rng, cfg.sensor.num_points)])
    pc2 = np.stack([synthetic_scan(rng, cfg.sensor.num_points)])
    from efficientlo_net_tpu.ops.projection import project_to_range_image

    p1, _ = project_to_range_image(
        jax.numpy.asarray(pc1), None, cfg.sensor.height, cfg.sensor.width,
        cfg.sensor, method="packed",
    )
    p2, _ = project_to_range_image(
        jax.numpy.asarray(pc2), None, cfg.sensor.height, cfg.sensor.width,
        cfg.sensor, method="packed",
    )
    variables = model.init(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1, p2, training=False,
    )
    return cfg, model, variables, pc1, pc2


def test_export_roundtrip_matches_direct(tiny_setup, tmp_path):
    cfg, model, variables, pc1, pc2 = tiny_setup

    blob = export_odometry(model, cfg, variables, batch_size=1,
                           platforms=("cpu",))
    assert len(blob) > 1000

    path = save_artifact(str(tmp_path / "odom"), blob)
    assert path.endswith(".stablehlo")
    exported, call = load_odometry(path)
    q_x, t_x = call(pc1, pc2)

    q_d, t_d = jax.jit(make_infer_fn(model, cfg, variables))(pc1, pc2)
    np.testing.assert_allclose(np.asarray(q_x), np.asarray(q_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_x), np.asarray(t_d), atol=1e-5)
    # a unit quaternion came out
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_x), axis=-1), 1.0, atol=1e-5
    )


def test_infer_fn_crops_like_streaming(tiny_setup):
    """The exported path must apply the same validity-mask + planar crop as
    the streaming/training paths: far points beyond max_planar_radius must
    not change the output (no train/serve skew)."""
    cfg, model, variables, pc1, pc2 = tiny_setup

    # base scans: last 32 slots zeroed (padding); spiked scans: the same
    # slots hold out-of-crop points (beyond the planar radius, inside the
    # vertical FOV and the packed method's range clip)
    def base_and_spiked(pc, rng):
        base = pc.copy()
        base[0, -32:] = 0.0
        far = rng.uniform(
            cfg.sensor.max_planar_radius * 1.5,
            cfg.sensor.max_planar_radius * 2.0, size=(32, 3),
        ).astype(np.float32)
        far[:, 2] = rng.uniform(-1.0, 1.0, size=32)
        spiked = base.copy()
        spiked[0, -32:] = far
        return base, spiked

    rng = np.random.default_rng(7)
    b1, s1 = base_and_spiked(pc1, rng)
    b2, s2 = base_and_spiked(pc2, rng)
    infer = jax.jit(make_infer_fn(model, cfg, variables))
    q0, t0 = infer(b1, b2)
    q1, t1 = infer(s1, s2)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), atol=1e-6)


def test_export_multiplatform_lists_targets(tiny_setup):
    cfg, model, variables, _, _ = tiny_setup
    blob = export_odometry(model, cfg, variables, batch_size=1,
                           platforms=("cpu", "tpu"))
    exported, _ = load_odometry(blob)
    assert set(p.lower() for p in exported.platforms) == {"cpu", "tpu"}
