"""W-axis ring sharding: the shard_map + ppermute halo-exchange select must
be bit-identical to the unsharded op at every supported level geometry
(VERDICT r1 item 2; reference wrap semantics fused_conv_g.cu:89-97)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from efficientlo_net_tpu.ops import neighbors as N
from efficientlo_net_tpu.parallel.ring import (
    ring_select_and_group,
    ring_select_neighbors,
)
from tests.test_neighbors import make_grids


def ring_mesh(data: int, ring: int) -> Mesh:
    if data * ring > len(jax.devices()):
        data = 1  # 8 virtual devices: ring=5 runs with a singleton data axis
    devs = np.array(jax.devices()[: data * ring]).reshape(data, ring)
    return Mesh(devs, ("data", "ring"))


def assert_identical(got_idx, got_mask, want_idx, want_mask):
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(want_mask))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


# --- real reference level geometries (pwclo_model.py:42-50, SURVEY §3.3) ---
# (name, grid1 hw, grid2 hw, kernel, k, distance, cs, ss, mode, ring)
GEOMETRIES = [
    # down_conv l0: 64x1800 grid, centers strided (4,8) -> 16x225, kernel 9x15
    ("down_l0", (64, 1800), (64, 1800), (9, 15), 32, 0.5, (4, 8), (1, 1),
     N.FIRST_K, 3),
    ("down_l0_r5", (64, 1800), (64, 1800), (9, 15), 32, 0.5, (4, 8), (1, 1),
     N.FIRST_K, 5),
    # l0 refine cost-volume stage 1: 16x225 grids, kernel2 (11,41), KNN
    ("cv_l0_knn", (16, 225), (16, 225), (11, 41), 6, 1000.0, (1, 1), (1, 1),
     N.KNN, 3),
    # cost-volume stage 2 self-aggregation: kernel1 (3,5), first-K
    ("cv_l0_agg", (16, 225), (16, 225), (3, 5), 4, 1.0, (1, 1), (1, 1),
     N.FIRST_K, 5),
    # l2-shaped cost volume: 4x57 grids (57 = 3*19), kernel2 (5,15)
    ("cv_l2_knn", (4, 57), (4, 57), (5, 15), 6, 1000.0, (1, 1), (1, 1),
     N.KNN, 3),
]


@pytest.mark.parametrize(
    "name,hw1,hw2,kernel,k,dist,cs,ss,mode,ring",
    GEOMETRIES,
    ids=[g[0] for g in GEOMETRIES],
)
def test_ring_select_matches_unsharded(name, hw1, hw2, kernel, k, dist, cs,
                                       ss, mode, ring):
    rng = np.random.default_rng(hash(name) % 2**31)
    g1, _ = make_grids(rng, b=2, h1=hw1[0], w1=hw1[1], h2=4, w2=6)
    _, g2 = make_grids(rng, b=2, h1=4, w1=6, h2=hw2[0], w2=hw2[1])
    if hw1 == hw2 and cs != (1, 1):
        g2 = g1  # down_conv path selects on its own grid
    perm = rng.permutation(kernel[0] * kernel[1]) if mode == N.FIRST_K else None
    pj = jnp.asarray(perm) if perm is not None else None

    want_idx, want_mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), kernel, k, dist,
        center_stride=cs, source_stride=ss, mode=mode, perm=pj, impl="fast",
    )
    mesh = ring_mesh(2, ring)
    got_idx, got_mask = ring_select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), kernel, k, dist,
        mesh=mesh, center_stride=cs, source_stride=ss, mode=mode, perm=pj,
    )
    assert_identical(got_idx, got_mask, want_idx, want_mask)


def test_ring_strided_source_up_conv_path():
    # dense (8, 90) centers querying a (4, 45) coarse grid, stride (2, 2) —
    # the up_conv geometry (pointnet_util.py:272-274), ring=3
    rng = np.random.default_rng(11)
    g1, _ = make_grids(rng, b=2, h1=8, w1=90)
    _, g2 = make_grids(rng, b=2, h2=4, w2=45)
    want_idx, want_mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 5), 3, 6.0,
        source_stride=(2, 2), mode=N.FIRST_K, impl="fast",
    )
    got_idx, got_mask = ring_select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 5), 3, 6.0,
        mesh=ring_mesh(2, 3), source_stride=(2, 2), mode=N.FIRST_K,
    )
    assert_identical(got_idx, got_mask, want_idx, want_mask)


def test_ring_wrap_crosses_seam():
    # points clustered at the azimuth seam: neighbors must flow across the
    # ring boundary exactly like the cylindrical wrap
    rng = np.random.default_rng(5)
    g1, g2 = make_grids(rng, b=1, h1=4, w1=12, h2=4, w2=12, invalid_frac=0.0)
    want_idx, want_mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 7), 5, 1000.0, mode=N.KNN,
        impl="fast",
    )
    got_idx, got_mask = ring_select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 7), 5, 1000.0,
        mesh=ring_mesh(2, 4), mode=N.KNN,
    )
    assert_identical(got_idx, got_mask, want_idx, want_mask)
    # the first column's KNN window spans columns {-3..3} mod 12: shards 0 and
    # 3 must have exchanged halos for this to hold
    assert np.asarray(got_mask).sum() > 0


def test_ring_select_and_group_matches_unsharded():
    rng = np.random.default_rng(3)
    g1, _ = make_grids(rng, b=2, h1=8, w1=24)
    feats = rng.standard_normal((2, 8, 24, 5)).astype(np.float32)
    perm = jnp.asarray(rng.permutation(15))
    want = N.select_and_group(
        jnp.asarray(g1), jnp.asarray(feats), (3, 5), 4, 2.0,
        center_stride=(2, 2), mode=N.FIRST_K, perm=perm,
    )
    got = ring_select_and_group(
        jnp.asarray(g1), jnp.asarray(feats), (3, 5), 4, 2.0,
        mesh=ring_mesh(2, 3), center_stride=(2, 2), mode=N.FIRST_K, perm=perm,
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-6)


def test_ring_guards():
    mesh = ring_mesh(2, 4)
    g = jnp.zeros((1, 4, 10, 3))
    with pytest.raises(ValueError, match="must divide"):
        ring_select_neighbors(g, g, (3, 3), 2, 1.0, mesh=mesh)  # 4 !| 10
    g12 = jnp.zeros((1, 4, 12, 3))
    with pytest.raises(ValueError, match="too wide"):
        # halo 5 > 3-column sector
        ring_select_neighbors(g12, g12, (3, 11), 2, 1.0, mesh=mesh)
    with pytest.raises(ValueError, match="does not map"):
        ring_select_neighbors(
            g12, jnp.zeros((1, 4, 8, 3)), (3, 3), 2, 1.0,
            mesh=mesh, source_stride=(1, 2),
        )


def test_model_forward_with_ring_mesh_matches_unsharded():
    """Full PWCLO forward with the level-0 select ring-sharded must match
    the unsharded forward (eval mode)."""
    from efficientlo_net_tpu.config import tiny_model_config
    from efficientlo_net_tpu.models.pwclo import PWCLONet
    from efficientlo_net_tpu.ops.projection import project_to_range_image
    from tests.test_model import synthetic_scan

    cfg = tiny_model_config()
    model = PWCLONet(cfg)
    rng = np.random.default_rng(0)
    h, w = cfg.sensor.height, cfg.sensor.width
    scans = [synthetic_scan(rng, cfg.sensor.num_points) for _ in range(2)]
    p1, _ = project_to_range_image(
        jnp.asarray(scans[0][None]), None, h, w, cfg.sensor
    )
    p2, _ = project_to_range_image(
        jnp.asarray(scans[1][None]), None, h, w, cfg.sensor
    )
    from tests.test_model import jit_eval_apply, jit_init

    variables = jit_init(model)(
        {"params": jax.random.key(0), "neighbor": jax.random.key(1),
         "dropout": jax.random.key(2)},
        p1, p2, training=False,
    )
    out_ref = jit_eval_apply(model)(variables, p1, p2)
    mesh = ring_mesh(2, 4)
    out_ring = jax.jit(
        lambda v, a, b: model.apply(v, a, b, training=False, ring_mesh=mesh)
    )(variables, p1, p2)
    for lvl in range(4):
        np.testing.assert_allclose(
            np.asarray(out_ring["q"][lvl]), np.asarray(out_ref["q"][lvl]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_ring["t"][lvl]), np.asarray(out_ref["t"][lvl]),
            atol=1e-4,
        )
