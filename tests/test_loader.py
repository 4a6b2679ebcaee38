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


def test_mirror_batch_preserves_alignment_invariant():
    """y-reflection augmentation: pc2' = R' pc1' + t' must hold exactly with
    T' = M T M (the invariant synthetic_pair constructs and preprocess
    consumes)."""
    from efficientlo_net_tpu.config import SensorConfig
    from efficientlo_net_tpu.data.augmentation import mirror_batch
    from efficientlo_net_tpu.data.synthetic import synthetic_pair

    rng = np.random.default_rng(0)
    sensor = SensorConfig(num_points=256)
    pc1, pc2, T = [], [], []
    for _ in range(8):
        a, b, m = synthetic_pair(rng, sensor)
        pc1.append(a)
        pc2.append(b)
        T.append(m)
    batch = {"pc1": np.stack(pc1), "pc2": np.stack(pc2), "T_gt": np.stack(T)}

    out = mirror_batch(batch, np.random.default_rng(3))
    flipped = [i for i in range(8)
               if not np.array_equal(out["pc1"][i], batch["pc1"][i])]
    kept = [i for i in range(8) if i not in flipped]
    assert flipped and kept  # p=0.5 over 8 samples: both cases present

    for i in range(8):
        R = out["T_gt"][i][:3, :3]
        t = out["T_gt"][i][:3, 3]
        # rotation stays proper (det +1) under conjugation
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            out["pc1"][i] @ R.T + t, out["pc2"][i], atol=1e-5
        )
    for i in flipped:
        np.testing.assert_array_equal(out["pc1"][i][:, 1],
                                      -batch["pc1"][i][:, 1])
        np.testing.assert_array_equal(out["pc1"][i][:, 0],
                                      batch["pc1"][i][:, 0])
        # yaw flips sign: R'[1,0] = -R[1,0]
        np.testing.assert_allclose(out["T_gt"][i][1, 0],
                                   -batch["T_gt"][i][1, 0], atol=1e-6)


def test_loader_mirrors_only_in_training():
    from efficientlo_net_tpu.data.loader import make_batch

    ds = FakeDataset()
    rng = np.random.default_rng(0)
    b_eval = make_batch(ds, [1, 2, 3, 4], rng, training=False)
    # eval: exactly the dataset arrays, no reflection
    for i, idx in enumerate([1, 2, 3, 4]):
        np.testing.assert_array_equal(b_eval["pc1"][i],
                                      np.full((16, 3), float(idx)))
    # training with a fixed seed is deterministic and mirrors some samples
    b1 = make_batch(ds, [1, 2, 3, 4], np.random.default_rng(7), training=True)
    b2 = make_batch(ds, [1, 2, 3, 4], np.random.default_rng(7), training=True)
    np.testing.assert_array_equal(b1["pc1"], b2["pc1"])
    np.testing.assert_array_equal(b1["T_gt"], b2["T_gt"])
