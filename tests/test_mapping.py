"""Map assembly from keyframe payloads (backend/mapping.py)."""

import numpy as np

from efficientlo_net_tpu.backend.mapping import (
    assemble_map,
    range_image_points,
    save_map_ply,
    voxel_downsample,
)


def _payload(points: np.ndarray, h: int = 4, w: int = 8) -> np.ndarray:
    """Pack an (M, 3) point list into a zero-padded (h, w, 3) range image."""
    img = np.zeros((h * w, 3), dtype=np.float32)
    img[: len(points)] = points
    return img.reshape(h, w, 3)


def test_range_image_points_drops_empty_pixels():
    pts = np.array([[1.0, 2.0, 3.0], [0.5, 0.0, 0.0]])
    img = _payload(pts)
    out = range_image_points(img)
    np.testing.assert_allclose(out, pts)


def test_voxel_downsample_merges_cells():
    rng = np.random.default_rng(0)
    # 100 points in each of two far-apart cells
    a = rng.uniform(0.0, 0.09, (100, 3))
    b = rng.uniform(5.0, 5.09, (100, 3))
    out = voxel_downsample(np.concatenate([a, b]), voxel=0.1)
    assert len(out) <= 4  # at most a couple of cells per cluster
    # centroids stay inside their clusters
    assert np.all(out.min(axis=0) < 0.1) and np.all(out.max(axis=0) > 4.9)


def test_assemble_map_fuses_two_views_of_one_world():
    rng = np.random.default_rng(1)
    world = rng.uniform(-2.0, 2.0, (200, 3))

    def pose(yaw, t):
        c, s = np.cos(yaw), np.sin(yaw)
        m = np.eye(4)
        m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        m[:3, 3] = t
        return m

    pa = pose(0.3, [1.0, -2.0, 0.1])
    pb = pose(-0.8, [-3.0, 0.5, -0.2])
    # payloads = the same world expressed in each keyframe's lidar frame
    local_a = (world - pa[:3, 3]) @ pa[:3, :3]
    local_b = (world - pb[:3, 3]) @ pb[:3, :3]
    m = assemble_map(
        [pa, pb],
        [_payload(local_a, 20, 10), _payload(local_b, 20, 10)],
        voxel=0.05,
    )
    # both views land on the same world points -> dedup to ~one copy
    assert len(m) <= len(world) * 1.05
    from scipy.spatial import cKDTree

    d, _ = cKDTree(world).query(m)
    assert d.max() < 0.05 * np.sqrt(3)


def test_assemble_map_skips_none_and_respects_max_range():
    pts = np.array([[1.0, 0, 0], [30.0, 0, 0]])
    m = assemble_map([np.eye(4), np.eye(4)], [_payload(pts), None],
                     voxel=0.0, max_range=10.0)
    np.testing.assert_allclose(m, [[1.0, 0, 0]])


def test_save_map_ply(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [-1.0, 0.5, 0.25]])
    path = str(tmp_path / "map.ply")
    save_map_ply(path, pts)
    lines = open(path).read().splitlines()
    assert lines[0] == "ply" and "element vertex 2" in lines[2]
    got = np.loadtxt(lines[-2:])
    np.testing.assert_allclose(got, pts, atol=1e-3)
