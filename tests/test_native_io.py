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
