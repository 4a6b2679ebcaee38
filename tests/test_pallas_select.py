"""Pallas fused select kernel vs the XLA formulation (interpret mode on CPU).

The kernel's selected K *set* and mask must match ``select_neighbors``; the
order within the K slots is unspecified (every consumer pools/attends over
K).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientlo_net_tpu.ops import neighbors as N
from efficientlo_net_tpu.ops.pallas_select import pallas_window_select
from tests.test_neighbors import make_grids


def sets_equal(idx_a, mask_a, idx_b, mask_b):
    idx_a, mask_a = np.asarray(idx_a), np.asarray(mask_a)[..., 0]
    idx_b, mask_b = np.asarray(idx_b), np.asarray(mask_b)[..., 0]
    np.testing.assert_array_equal(mask_a.sum(-1), mask_b.sum(-1))
    b, n, _ = idx_a.shape
    for bi in range(b):
        for ni in range(n):
            got = sorted(idx_a[bi, ni][mask_a[bi, ni] > 0].tolist())
            want = sorted(idx_b[bi, ni][mask_b[bi, ni] > 0].tolist())
            assert got == want, (bi, ni, got, want)


@pytest.mark.parametrize("mode", ["first_k", "knn"])
@pytest.mark.parametrize("distance", [2.0, 1000.0])
def test_pallas_matches_xla(mode, distance):
    rng = np.random.default_rng(0)
    g1, g2 = make_grids(rng, b=2, h1=8, w1=16)
    perm = jnp.asarray(rng.permutation(15)) if mode == "first_k" else None

    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g2), (3, 5), 4, distance,
        mode=mode, perm=perm, interpret=True,
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 5), 4, distance,
        mode=mode, perm=perm, impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)


def test_pallas_wide_window_wrap():
    # window wider than W exercises multi-wrap padding
    rng = np.random.default_rng(1)
    g1, g2 = make_grids(rng, b=1, h1=4, w1=8, h2=4, w2=8)
    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g2), (3, 7), 3, 1000.0,
        mode="knn", interpret=True,
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 7), 3, 1000.0,
        mode="knn", impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)


@pytest.mark.parametrize("mode", ["first_k", "knn"])
def test_pallas_strided_centers_down_conv(mode):
    rng = np.random.default_rng(5)
    g1, _ = make_grids(rng, b=2, h1=8, w1=16)
    perm = jnp.asarray(rng.permutation(15)) if mode == "first_k" else None
    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g1), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm, interpret=True,
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm, impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)


@pytest.mark.parametrize("mode", ["first_k", "knn"])
def test_pallas_strided_source_up_conv(mode):
    rng = np.random.default_rng(6)
    g1, _ = make_grids(rng, b=2, h1=8, w1=16)
    _, g2 = make_grids(rng, b=2, h2=4, w2=8)
    perm = jnp.asarray(rng.permutation(9)) if mode == "first_k" else None
    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 3, 6.0,
        source_stride=(2, 2), mode=mode, perm=perm, interpret=True,
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 3, 6.0,
        source_stride=(2, 2), mode=mode, perm=perm, impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)


@pytest.mark.parametrize("mode", ["first_k", "knn"])
def test_pallas_select_and_group_matches_gather(mode):
    from efficientlo_net_tpu.ops.pallas_select import pallas_select_and_group

    rng = np.random.default_rng(11)
    g1, _ = make_grids(rng, b=2, h1=8, w1=16)
    feats = rng.standard_normal((2, 8, 16, 5)).astype(np.float32)
    perm = jnp.asarray(rng.permutation(15)) if mode == "first_k" else None

    gx, gf, gm = pallas_select_and_group(
        jnp.asarray(g1), jnp.asarray(feats), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm, interpret=True,
    )
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm, impl="fast",
    )
    gm = np.asarray(gm)
    np.testing.assert_array_equal(gm.sum(2), np.asarray(mask).sum(2))
    # value multisets per center must match the gathered ones (K order free)
    want = np.asarray(
        N.gather_by_index(
            jnp.concatenate([jnp.asarray(g1), jnp.asarray(feats)], -1), idx
        )
    ) * np.asarray(mask)
    got = np.concatenate([np.asarray(gx), np.asarray(gf)], -1)
    for bi in range(got.shape[0]):
        for ni in range(got.shape[1]):
            a = np.sort(got[bi, ni], axis=0)
            b_ = np.sort(want[bi, ni], axis=0)
            np.testing.assert_allclose(a, b_, atol=1e-6)


def test_pallas_uneven_strided_centers():
    rng = np.random.default_rng(7)
    g1, _ = make_grids(rng, b=1, h1=7, w1=10)
    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g1), (3, 3), 4, 100.0,
        center_stride=(2, 3), mode="knn", interpret=True,
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 3), 4, 100.0,
        center_stride=(2, 3), mode="knn", impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)


def test_pallas_uneven_tile_height():
    rng = np.random.default_rng(2)
    g1, g2 = make_grids(rng, b=1, h1=6, w1=8, h2=6, w2=8)
    idx_p, mask_p = pallas_window_select(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 2, 3.0,
        mode="knn", tile_h=4, interpret=True,  # 6 % 4 != 0 -> falls back
    )
    idx_x, mask_x = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 2, 3.0,
        mode="knn", impl="fast",
    )
    sets_equal(idx_p, mask_p, idx_x, mask_x)
