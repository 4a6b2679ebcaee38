import numpy as np
import jax.numpy as jnp

from efficientlo_net_tpu.config import SensorConfig
from efficientlo_net_tpu.ops.projection import project_to_range_image, pixel_coords
from tests.oracles import oracle_project

SENSOR = SensorConfig(height=16, width=64, num_points=512)


def random_cloud(rng, n, invalid_frac=0.2):
    pts = rng.standard_normal((n, 3)) * np.array([10.0, 10.0, 1.5])
    kill = rng.random(n) < invalid_frac
    pts[kill] = 0.0
    return pts.astype(np.float32)


import pytest


@pytest.mark.parametrize("method", ["sort", "scatter"])
def test_projection_matches_oracle(method):
    rng = np.random.default_rng(0)
    pts = np.stack([random_cloud(rng, 512) for _ in range(3)])
    img, _ = project_to_range_image(jnp.asarray(pts), None, 16, 64, SENSOR, method)
    img = np.asarray(img)
    for b in range(3):
        ref, _ = oracle_project(pts[b], None, 16, 64, SENSOR)
        np.testing.assert_allclose(img[b], ref, atol=1e-5)


@pytest.mark.parametrize("method", ["sort", "scatter"])
def test_projection_dense_collisions(method):
    # many points per pixel: tiny grid forces heavy collisions
    rng = np.random.default_rng(5)
    pts = np.stack([random_cloud(rng, 2048, invalid_frac=0.1) for _ in range(2)])
    img, _ = project_to_range_image(jnp.asarray(pts), None, 4, 8, SENSOR, method)
    for b in range(2):
        ref, _ = oracle_project(pts[b], None, 4, 8, SENSOR)
        np.testing.assert_allclose(np.asarray(img)[b], ref, atol=1e-5)


def test_projection_packed_within_quantization():
    # packed method may deviate from the exact winner only within one
    # 60/8191 m quantization step of the true minimum range
    rng = np.random.default_rng(6)
    pts = np.stack([random_cloud(rng, 2048, invalid_frac=0.1) for _ in range(2)])
    img, _ = project_to_range_image(jnp.asarray(pts), None, 4, 8, SENSOR, "packed")
    img = np.asarray(img)
    tol = 60.0 / 8191.0 + 1e-6
    for b in range(2):
        ref, _ = oracle_project(pts[b], None, 4, 8, SENSOR)
        occ_ref = np.abs(ref).sum(-1) > 0
        occ_got = np.abs(img[b]).sum(-1) > 0
        np.testing.assert_array_equal(occ_got, occ_ref)
        r_got = np.linalg.norm(img[b], axis=-1)
        r_ref = np.linalg.norm(ref, axis=-1)
        assert np.all(r_got[occ_ref] <= r_ref[occ_ref] + tol)


def test_projection_packed_exact_when_separated():
    # well-separated ranges: packed == exact
    rng = np.random.default_rng(7)
    pts = np.stack([random_cloud(rng, 256, invalid_frac=0.2) for _ in range(2)])
    a, _ = project_to_range_image(jnp.asarray(pts), None, 16, 64, SENSOR, "packed")
    b, _ = project_to_range_image(jnp.asarray(pts), None, 16, 64, SENSOR, "scatter")
    # identical except possibly sub-quantization ties (none expected here)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_projection_with_features_matches_oracle():
    rng = np.random.default_rng(1)
    pts = np.stack([random_cloud(rng, 256) for _ in range(2)])
    feats = rng.standard_normal((2, 256, 5)).astype(np.float32)
    img, fimg = project_to_range_image(jnp.asarray(pts), jnp.asarray(feats), 16, 64, SENSOR)
    for b in range(2):
        ref_img, ref_f = oracle_project(pts[b], feats[b], 16, 64, SENSOR)
        np.testing.assert_allclose(np.asarray(img[b]), ref_img, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fimg[b]), ref_f, atol=1e-5)


def test_min_range_collision():
    # two points in the same pixel: the closer one must win
    far = np.array([20.0, 0.01, 0.0])
    near = np.array([10.0, 0.005, 0.0])
    pts = np.stack([far, near])[None].astype(np.float32)
    img, _ = project_to_range_image(jnp.asarray(pts), None, 16, 64, SENSOR)
    img = np.asarray(img)[0]
    nz = img[np.abs(img).sum(-1) > 0]
    assert nz.shape[0] == 1
    np.testing.assert_allclose(nz[0], near, atol=1e-6)


def test_invalid_points_excluded():
    pts = np.zeros((1, 64, 3), dtype=np.float32)
    img, _ = project_to_range_image(jnp.asarray(pts), None, 16, 64, SENSOR)
    assert float(jnp.abs(img).sum()) == 0.0


def test_pixel_coords_hdl64_ranges():
    sensor = SensorConfig()
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((1000, 3)).astype(np.float32) * np.array(
        [15.0, 15.0, 2.0], dtype=np.float32
    )
    row, col, valid, r = pixel_coords(jnp.asarray(pts), 64, 1800, sensor)
    assert int(jnp.min(row)) >= 0 and int(jnp.max(row)) <= 63
    assert int(jnp.min(col)) >= 0 and int(jnp.max(col)) <= 1799


def test_sensor_presets_project():
    """Every preset sensor projects a synthetic scan onto its own grid with
    the same validity semantics as the HDL-64 default."""
    from efficientlo_net_tpu.config import SENSOR_PRESETS, sensor_preset

    rng = np.random.default_rng(0)
    for name, sensor in SENSOR_PRESETS.items():
        assert sensor_preset(name) is sensor
        n = 4096
        pts = np.zeros((1, n, 3), np.float32)
        m = n // 2
        az = rng.uniform(-np.pi, np.pi, m)
        el = np.deg2rad(rng.uniform(
            sensor.vertical_fov_down_deg, sensor.vertical_fov_up_deg, m))
        r = rng.uniform(3.0, 30.0, m)
        pts[0, :m, 0] = r * np.cos(el) * np.cos(az)
        pts[0, :m, 1] = r * np.cos(el) * np.sin(az)
        pts[0, :m, 2] = r * np.sin(el)
        img, _ = project_to_range_image(
            jnp.asarray(pts), None, sensor.height, sensor.width, sensor)
        img = np.asarray(img)
        assert img.shape == (1, sensor.height, sensor.width, 3)
        filled = np.any(img != 0, axis=-1).sum()
        assert filled > m * 0.8  # few collisions at this density

    import pytest
    with pytest.raises(ValueError):
        sensor_preset("nope")
