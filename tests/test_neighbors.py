import numpy as np
import jax.numpy as jnp
import pytest

from efficientlo_net_tpu.ops import neighbors as N
from tests.oracles import oracle_window_select


def make_grids(rng, b=2, h1=8, w1=16, h2=8, w2=16, invalid_frac=0.3):
    g1 = rng.standard_normal((b, h1, w1, 3)).astype(np.float32) * 2.0
    g2 = rng.standard_normal((b, h2, w2, 3)).astype(np.float32) * 2.0
    for g in (g1, g2):
        kill = rng.random(g.shape[:-1]) < invalid_frac
        g[kill] = 0.0
    return g1, g2


def check_against_oracle(idx, mask, ref_idx, ref_mask, mode):
    idx, mask = np.asarray(idx), np.asarray(mask)[..., 0]
    np.testing.assert_array_equal(mask, ref_mask)
    if mode == "first_k":
        np.testing.assert_array_equal(idx * ref_mask.astype(np.int64), ref_idx)
    else:
        # KNN tie order can differ; compare sorted index sets per center
        b, n, k = idx.shape
        for bi in range(b):
            for ni in range(n):
                got = sorted(idx[bi, ni][mask[bi, ni] > 0].tolist())
                want = sorted(ref_idx[bi, ni][ref_mask[bi, ni] > 0].tolist())
                assert got == want, (bi, ni, got, want)


@pytest.mark.parametrize("impl", ["fast", "reference"])
@pytest.mark.parametrize("mode", ["first_k", "knn"])
@pytest.mark.parametrize("distance", [1.5, 1000.0])
def test_same_grid_selection(impl, mode, distance):
    rng = np.random.default_rng(42)
    g1, g2 = make_grids(rng)
    perm = rng.permutation(3 * 5)
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 5), 4, distance,
        mode=mode, perm=jnp.asarray(perm), impl=impl,
    )
    ref_idx, ref_mask = oracle_window_select(
        g1, g2, N.grid_centers(8, 16), (3, 5), 4, distance, mode=mode, perm=perm
    )
    check_against_oracle(idx, mask, ref_idx, ref_mask, mode)


@pytest.mark.parametrize("impl", ["fast", "reference"])
@pytest.mark.parametrize("mode", ["first_k", "knn"])
def test_strided_source_up_conv_path(impl, mode):
    # dense 8x16 centers querying a 4x8 coarse grid with source stride (2,2)
    # (pointnet_util.py:272-274)
    rng = np.random.default_rng(7)
    g1, _ = make_grids(rng, h1=8, w1=16)
    _, g2 = make_grids(rng, h2=4, w2=8)
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 3, 6.0,
        source_stride=(2, 2), mode=mode, impl=impl,
    )
    ref_idx, ref_mask = oracle_window_select(
        g1, g2, N.grid_centers(8, 16), (3, 3), 3, 6.0, stride=(2, 2), mode=mode
    )
    check_against_oracle(idx, mask, ref_idx, ref_mask, mode)


@pytest.mark.parametrize("impl", ["fast", "reference"])
def test_strided_centers_down_conv_path(impl):
    # strided centers on the same grid (pointnet_util.py:197-199)
    rng = np.random.default_rng(3)
    g1, _ = make_grids(rng, h1=8, w1=16)
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode="knn", impl=impl,
    )
    ref_idx, ref_mask = oracle_window_select(
        g1, g1, N.grid_centers(8, 16, 2, 4), (3, 5), 4, 2.0, mode="knn"
    )
    check_against_oracle(idx, mask, ref_idx, ref_mask, "knn")


@pytest.mark.parametrize("impl", ["fast", "reference"])
def test_uneven_strided_centers(impl):
    # H not divisible by stride: ceil-sized output grid (reference
    # out_h_list uses math.ceil, pwclo_model.py:45-50)
    rng = np.random.default_rng(13)
    g1, _ = make_grids(rng, h1=7, w1=10)
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 3), 4, 100.0,
        center_stride=(2, 3), mode="knn", impl=impl,
    )
    assert idx.shape[1] == 4 * 4  # ceil(7/2) * ceil(10/3)
    ref_idx, ref_mask = oracle_window_select(
        g1, g1, N.grid_centers(7, 10, 2, 3), (3, 3), 4, 100.0, mode="knn"
    )
    check_against_oracle(idx, mask, ref_idx, ref_mask, "knn")


@pytest.mark.parametrize("impl", ["fast", "reference"])
def test_cylindrical_wrap(impl):
    # a center at column 0 must see neighbors at the far right columns
    h, w = 4, 8
    g = np.zeros((1, h, w, 3), dtype=np.float32)
    g[0, 1, 0] = [1.0, 0.0, 0.0]   # center
    g[0, 1, w - 1] = [1.1, 0.0, 0.0]  # wrap neighbor
    idx, mask = N.select_neighbors(
        jnp.asarray(g), jnp.asarray(g), (1, 3), 2, 10.0, mode="knn", impl=impl
    )
    center_n = 1 * w + 0
    got = set(
        np.asarray(idx)[0, center_n][np.asarray(mask)[0, center_n, :, 0] > 0].tolist()
    )
    assert got == {1 * w + 0, 1 * w + (w - 1)}


@pytest.mark.parametrize("impl", ["fast", "reference"])
def test_invalid_center_masks_everything(impl):
    rng = np.random.default_rng(9)
    g1, g2 = make_grids(rng, invalid_frac=0.0)
    g1[0, 2, 3] = 0.0  # kill one center
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 4, 100.0, mode="knn", impl=impl
    )
    n = 2 * 16 + 3
    assert float(jnp.sum(mask[0, n])) == 0.0
    assert float(jnp.sum(mask[1, n])) > 0.0  # batch 1 center still valid


def test_first_k_respects_permutation():
    rng = np.random.default_rng(21)
    g1, _ = make_grids(rng, b=1, invalid_frac=0.0)
    perm = rng.permutation(9)
    for impl in ("fast", "reference"):
        idx, mask = N.select_neighbors(
            jnp.asarray(g1), jnp.asarray(g1), (3, 3), 2, 100.0,
            mode="first_k", perm=jnp.asarray(perm), impl=impl,
        )
        ref_idx, ref_mask = oracle_window_select(
            g1, g1, N.grid_centers(8, 16), (3, 3), 2, 100.0,
            mode="first_k", perm=perm,
        )
        check_against_oracle(idx, mask, ref_idx, ref_mask, "first_k")


@pytest.mark.parametrize("mode", ["first_k", "knn"])
def test_select_and_group_matches_select_plus_gather(mode):
    rng = np.random.default_rng(17)
    g1, _ = make_grids(rng, h1=8, w1=16)
    feats = rng.standard_normal((2, 8, 16, 5)).astype(np.float32)
    perm = jnp.asarray(rng.permutation(15)) if mode == "first_k" else None

    gx, gf, gm = N.select_and_group(
        jnp.asarray(g1), jnp.asarray(feats), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm,
    )
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g1), (3, 5), 4, 2.0,
        center_stride=(2, 4), mode=mode, perm=perm, impl="fast",
    )
    np.testing.assert_array_equal(np.asarray(gm), np.asarray(mask))
    want_x = np.asarray(N.gather_by_index(jnp.asarray(g1), idx)) * np.asarray(mask)
    want_f = np.asarray(N.gather_by_index(jnp.asarray(feats), idx)) * np.asarray(mask)
    np.testing.assert_allclose(np.asarray(gx), want_x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), want_f, atol=1e-6)


def test_fill_empty_slots_flag_copy_semantics():
    rng = np.random.default_rng(23)
    g1, g2 = make_grids(rng)
    idx, mask = N.select_neighbors(
        jnp.asarray(g1), jnp.asarray(g2), (3, 3), 4, 1.0, mode="knn"
    )
    fidx, fmask = N.fill_empty_slots_with_first(idx, mask)
    idx, mask = np.asarray(idx), np.asarray(mask)
    fidx, fmask = np.asarray(fidx), np.asarray(fmask)
    for b in range(idx.shape[0]):
        for n in range(idx.shape[1]):
            if mask[b, n, 0, 0] > 0:
                # all slots filled; empties duplicated from slot 0
                assert fmask[b, n].min() == 1.0
                for kk in range(idx.shape[2]):
                    expect = idx[b, n, kk] if mask[b, n, kk, 0] > 0 else idx[b, n, 0]
                    assert fidx[b, n, kk] == expect
            else:
                # no hits at all: unchanged
                np.testing.assert_array_equal(fmask[b, n], mask[b, n])


def test_gather_by_index():
    rng = np.random.default_rng(11)
    img = rng.standard_normal((2, 4, 8, 5)).astype(np.float32)
    idx = rng.integers(0, 32, size=(2, 6, 3))
    out = np.asarray(N.gather_by_index(jnp.asarray(img), jnp.asarray(idx)))
    flat = img.reshape(2, 32, 5)
    for b in range(2):
        for n in range(6):
            for k in range(3):
                np.testing.assert_array_equal(out[b, n, k], flat[b, idx[b, n, k]])


def test_on_tpu_detection(monkeypatch):
    """Plugin-name dispatch: literal backends decide by name; unknown plugin
    names (e.g. a TPU tunnel reporting "axon") fall through to device_kind."""

    class _Dev:
        def __init__(self, kind):
            self.device_kind = kind

    def probe(backend, kind):
        monkeypatch.setattr(N, "_ON_TPU", None)
        monkeypatch.setattr(N.jax, "default_backend", lambda: backend)
        monkeypatch.setattr(N.jax, "devices", lambda: [_Dev(kind)])
        return N._on_tpu()

    assert probe("tpu", "anything") is True
    assert probe("cpu", "TPU v5 lite") is False  # name wins for known SW
    assert probe("axon", "TPU v5 lite") is True  # tunnel plugin -> probe kind
    assert probe("axon", "Fancy Accelerator") is False
    # cached after first real call
    monkeypatch.setattr(N, "_ON_TPU", None)
    assert N._on_tpu() is False  # conftest pins JAX_PLATFORMS=cpu
