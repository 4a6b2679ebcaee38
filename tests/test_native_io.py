import os
import subprocess

import numpy as np
import pytest

from efficientlo_net_tpu.data import native_io

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(ROOT, "native")], check=True,
                   capture_output=True)
    # force re-probe after build
    native_io._lib = None
    yield


def make_bin(tmp_path, n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 4)).astype(np.float32)
    p = str(tmp_path / "scan.bin")
    pts.tofile(p)
    return p, pts


def test_native_lib_loads():
    assert native_io.available()


def test_read_scan_matches_numpy(tmp_path):
    p, pts = make_bin(tmp_path)
    a = native_io.read_scan(p, 1000)
    b = native_io._read_scan_numpy(p, 1000)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a[:500], pts[:, :3])
    assert np.all(a[500:] == 0)


def test_read_scan_truncates(tmp_path):
    p, pts = make_bin(tmp_path, n=800)
    a = native_io.read_scan(p, 100)
    np.testing.assert_array_equal(a, pts[:100, :3])


def test_read_batch_parallel(tmp_path):
    paths, ptss = [], []
    for i in range(6):
        rng = np.random.default_rng(i)
        pts = rng.standard_normal((200 + i, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
        ptss.append(pts)
    batch = native_io.read_batch(paths, 300, num_threads=3)
    assert batch.shape == (6, 300, 3)
    for i in range(6):
        np.testing.assert_array_equal(batch[i, : 200 + i], ptss[i][:, :3])


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_io.read_scan(str(tmp_path / "nope.bin"), 10)


def _sensor():
    from efficientlo_net_tpu.config import ModelConfig

    return ModelConfig().sensor


def _random_cloud(n=20000, seed=0, batch=1):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-40, 40, size=(batch, n, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-3, 8, size=(batch, n)).astype(np.float32)
    pts[:, : n // 50] = 0.0  # padding block
    return pts


def test_project_matches_device_exact_method():
    """Host projection == the exact JAX method except libm-ulp boundary
    pixels (points landing within 1 ulp of a pixel edge)."""
    import jax

    from efficientlo_net_tpu.ops.projection import project_to_range_image

    s = _sensor()
    pts = _random_cloud(batch=2)
    host = native_io.project_batch(pts, 64, 1800, s)
    dev = np.asarray(
        project_to_range_image(pts, None, 64, 1800, s, method="sort")[0]
    )
    mismatch = np.any(host != dev, axis=-1).mean()
    assert mismatch < 5e-4, f"mismatch rate {mismatch}"


def test_project_native_matches_numpy_fallback_exactly():
    import math

    s = _sensor()
    pts = _random_cloud(n=30000, seed=3)[0]
    up = math.radians(s.vertical_fov_up_deg)
    down = math.radians(s.vertical_fov_down_deg)
    for crop in (0.0, 35.0):
        a = native_io.project_scan(pts, 64, 1800, s, crop_radius=crop)
        b = native_io._project_scan_numpy(pts, 64, 1800, up, down, crop)
        np.testing.assert_array_equal(a, b)


def test_project_chunk_parallel_identical_to_sequential():
    """Multi-threaded single-scan path must bit-match 1 thread (index-ordered
    tie merge)."""
    s = _sensor()
    pts = _random_cloud(n=150000, seed=7)[0]
    # force exact-range collisions: duplicate a block of points
    pts[100000:101000] = pts[:1000]
    seq = native_io.project_scan(pts, 64, 1800, s, num_threads=1)
    for nt in (2, 4, 8):
        mt = native_io.project_scan(pts, 64, 1800, s, num_threads=nt)
        np.testing.assert_array_equal(mt, seq)


def test_project_min_range_and_validity_semantics():
    """Hand-built collisions: nearer point wins its pixel; zero points and
    cropped points never scatter."""
    s = _sensor()
    # two points in the same direction, different ranges
    d = np.array([1.0, 0.2, 0.05])
    d /= np.linalg.norm(d)
    pts = np.zeros((6, 3), dtype=np.float32)
    pts[0] = 10.0 * d
    pts[1] = 5.0 * d  # nearer: must win
    pts[2] = 0.0  # invalid, never scatters
    pts[3] = [50.0, 0.0, 0.0]  # outside 35 m crop
    img = native_io.project_scan(pts, 64, 1800, s, crop_radius=35.0)
    occupied = img[np.any(img != 0, axis=-1)]
    assert len(occupied) == 1
    np.testing.assert_allclose(occupied[0], pts[1], rtol=1e-6)
    img_nocrop = native_io.project_scan(pts, 64, 1800, s)
    occ2 = img_nocrop[np.any(img_nocrop != 0, axis=-1)]
    assert len(occ2) == 2  # far point kept without crop
