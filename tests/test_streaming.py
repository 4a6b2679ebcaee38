import numpy as np
import jax
import jax.numpy as jnp

from efficientlo_net_tpu.config import tiny_model_config
from efficientlo_net_tpu.evaluation.streaming import OdometryStream
from efficientlo_net_tpu.models.pwclo import PWCLONet
from efficientlo_net_tpu.ops.projection import project_to_range_image
from tests.test_model import synthetic_scan

CFG = tiny_model_config()


def test_stream_matches_pairwise_forward():
    rng = np.random.default_rng(0)
    model = PWCLONet(CFG)
    scans = [synthetic_scan(rng, CFG.sensor.num_points) for _ in range(3)]
    h, w = CFG.sensor.height, CFG.sensor.width
    p0, _ = project_to_range_image(jnp.asarray(scans[0][None]), None, h, w, CFG.sensor)
    variables = model.init(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p0, p0, training=False,
    )

    stream = OdometryStream(model, variables, CFG)
    outs = [stream.push(s) for s in scans]

    # frame 0 pairs with itself; frames 1,2 pair with their predecessor —
    # must equal the batch-pairwise forward on the same projections.
    # Mirror the stream's preprocessing: 35 m planar crop + packed projection.
    def stream_proj(s):
        pts = jnp.asarray(s[None])
        keep = jnp.any(pts != 0.0, axis=-1) & (
            jnp.linalg.norm(pts[..., :2], axis=-1)
            <= CFG.sensor.max_planar_radius
        )
        return project_to_range_image(
            pts * keep[..., None], None, h, w, CFG.sensor, method="packed"
        )[0]

    projs = [stream_proj(s) for s in scans]
    for i, prev in [(1, 0), (2, 1)]:
        out = model.apply(variables, projs[i], projs[prev], training=False)
        np.testing.assert_allclose(
            outs[i][0], np.asarray(out["q"][0])[0], atol=1e-5
        )
        np.testing.assert_allclose(
            outs[i][1], np.asarray(out["t"][0])[0], atol=1e-5
        )
    # reset clears the cache
    stream.reset()
    q, t = stream.push(scans[2])
    out_self = model.apply(variables, projs[2], projs[2], training=False)
    np.testing.assert_allclose(q, np.asarray(out_self["q"][0])[0], atol=1e-5)

    # the stream exposes the last pushed scan's projection (SLAM keyframe
    # payload for scan factors, tools/synthetic_drive.py stage_slam)
    assert stream.last_projection.shape == (1, h, w, 3)
    np.testing.assert_allclose(
        np.asarray(stream.last_projection), np.asarray(projs[2]), atol=1e-6
    )


def test_stream_host_projection_matches_device():
    """Host-projected stream must produce the same poses as the device
    projection (both exact-min-range; tolerance covers the packed method's
    7.3 mm quantization and libm boundary ulps)."""
    import subprocess
    import os as _os

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    subprocess.run(["make", "-C", _os.path.join(root, "native")], check=True,
                   capture_output=True)
    from efficientlo_net_tpu.data import native_io

    native_io._lib = None
    assert native_io.available()

    rng = np.random.default_rng(1)
    model = PWCLONet(CFG)
    scans = [synthetic_scan(rng, CFG.sensor.num_points) for _ in range(3)]
    h, w = CFG.sensor.height, CFG.sensor.width
    p0, _ = project_to_range_image(jnp.asarray(scans[0][None]), None, h, w, CFG.sensor)
    variables = model.init(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p0, p0, training=False,
    )

    dev = OdometryStream(model, variables, CFG)
    host = OdometryStream(model, variables, CFG, host_projection=True)
    assert host._host_project is not None
    for s in scans:
        q_d, t_d = dev.push(s)
        q_h, t_h = host.push(s)
        np.testing.assert_allclose(q_h, q_d, atol=5e-3)
        np.testing.assert_allclose(t_h, t_d, atol=5e-2)
