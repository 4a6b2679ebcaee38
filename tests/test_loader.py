import numpy as np
import pytest

from efficientlo_net_tpu.data.loader import PrefetchLoader


class FakeDataset:
    """Returns deterministic arrays keyed by index."""

    num_points = 16

    def __getitem__(self, i):
        pc = np.full((16, 3), float(i), dtype=np.float32)
        return pc, pc + 0.5, np.eye(4, dtype=np.float32) * (i + 1)


def collect(loader, epoch=0):
    return list(loader.epoch(epoch))


def test_loader_order_and_content():
    ds = FakeDataset()
    loader = PrefetchLoader(ds, np.arange(10), batch_size=2, training=False,
                            num_workers=3)
    batches = collect(loader)
    assert len(batches) == 5
    for bi, b in enumerate(batches):
        assert b["pc1"].shape == (2, 16, 3)
        # eval order preserved: indices 2*bi, 2*bi+1
        np.testing.assert_array_equal(b["pc1"][0, 0, 0], float(2 * bi))
        np.testing.assert_array_equal(b["pc1"][1, 0, 0], float(2 * bi + 1))
        # eval mode: identity augmentation
        np.testing.assert_array_equal(b["T_trans"][0], np.eye(4))
        assert b["aug_frame"].dtype == np.int32


def test_loader_training_shuffles_deterministically():
    ds = FakeDataset()
    l1 = PrefetchLoader(ds, np.arange(20), 4, training=True, seed=7)
    l2 = PrefetchLoader(ds, np.arange(20), 4, training=True, seed=7)
    b1 = collect(l1, epoch=3)
    b2 = collect(l2, epoch=3)
    for a, b in zip(b1, b2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # different epoch -> different order
    b3 = collect(l1, epoch=4)
    assert any(
        not np.array_equal(a["pc1"], c["pc1"]) for a, c in zip(b1, b3)
    )
    # training aug is non-identity
    assert not np.allclose(b1[0]["T_trans"][0], np.eye(4))
    # inverse consistency
    np.testing.assert_allclose(
        b1[0]["T_trans"][0] @ b1[0]["T_trans_inv"][0], np.eye(4), atol=1e-5
    )


def test_loader_drop_last():
    ds = FakeDataset()
    loader = PrefetchLoader(ds, np.arange(10), 3, training=False, drop_last=True)
    assert len(loader) == 3
    loader2 = PrefetchLoader(ds, np.arange(10), 3, training=False, drop_last=False)
    assert len(loader2) == 4
    batches = collect(loader2)
    assert batches[-1]["pc1"].shape[0] == 1
