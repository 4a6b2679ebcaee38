"""KITTI odometry dataset provider (host-side, numpy).

Capability parity with reference ``kitti_dataset.py``:
* global frame index across 22 sequences via the cumulative length table
  (kitti_dataset.py:28-31);
* each item pairs frame t with frame t-1 (index 0 pairs frame 0 with itself,
  kitti_dataset.py:45-49);
* scans zero-padded to ``num_points``;
* per-pair GT relative transform from ``kitti_T_diff/XX_diff.npy``, conjugated
  into the LiDAR frame with the per-sequence calibration:
  ``T_gt = Tr^-1 @ T_diff @ Tr`` (kitti_dataset.py:100-101);
* sequences 11-21 (no GT) use identity (kitti_dataset.py:89-90).

Returned orientation matches the reference trainer's unpacking
(main.py:317): ``pc1`` is the *later* frame t, ``pc2`` is frame t-1.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

SEQ_LENGTH_TABLE = [
    0, 4541, 5642, 10303, 11104, 11375, 14136, 15237, 16338, 20409, 22000,
    23201, 24122, 25183, 28464, 29095, 30996, 32727, 33218, 35019, 40000,
    40831, 43552,
]
SEQ_NAMES = [f"{i:02d}" for i in range(22)]


def read_calib_file(path: str) -> dict:
    """Parse a KITTI ``calib.txt`` into ``{key: np.ndarray | str}``.

    Each line is ``KEY: v0 v1 ... vN``. Values that parse as a flat float
    vector become float64 arrays; anything else is kept as the raw string.
    (Same observable behavior as reference kitti_dataset.py:109-126.)
    """
    entries: dict = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            key, _, payload = line.partition(":")
            payload = payload.strip()
            tokens = payload.split()
            try:
                entries[key] = np.array([float(tok) for tok in tokens])
            except ValueError:
                entries[key] = payload
    return entries


def t_diff_from_poses(pose_path: str) -> np.ndarray:
    """Derive per-pair relative transforms from devkit absolute poses.

    ``XX.txt`` holds the devkit's absolute camera-frame poses P_i as 3x4
    rows. The reference's precomputed ``kitti_T_diff/XX_diff.npy`` arrays
    follow ``T_diff[i] = P_{i-1}^-1 @ P_i`` with ``T_diff[0] = I`` (verified
    bit-exact against the shipped seq-04 asset); reproduce that so a stock
    KITTI download works without the reference-repo precomputation.
    """
    rows = np.loadtxt(pose_path, dtype=np.float64).reshape(-1, 12)
    mats = np.concatenate(
        [
            rows.reshape(-1, 3, 4),
            np.broadcast_to(
                np.array([0.0, 0.0, 0.0, 1.0]), (rows.shape[0], 1, 4)
            ),
        ],
        axis=1,
    )
    rel = np.linalg.solve(mats[:-1], mats[1:])  # P_{i-1}^-1 @ P_i
    rel = np.concatenate([np.eye(4)[None], rel], axis=0)
    return rel[:, :3, :].reshape(-1, 12)


@lru_cache(maxsize=32)
def load_tr(calib_path: str) -> Tuple[np.ndarray, np.ndarray]:
    tr = read_calib_file(calib_path)["Tr"].reshape(3, 4)
    tr = np.vstack([tr, np.array([0.0, 0.0, 0.0, 1.0])])
    return tr, np.linalg.inv(tr)


class OdometryDataset:
    """Maps a global frame index to a (pc1, pc2, T_gt) training pair."""

    def __init__(
        self,
        root: str,
        num_points: int = 150000,
        gt_pose_dir: Optional[str] = None,
        cache_scans: bool = False,
    ):
        self.root = root
        self.num_points = num_points
        self.gt_pose_dir = gt_pose_dir or os.path.join(
            os.path.dirname(root), "ground_truth_pose"
        )
        self._t_diff_cache = {}
        # decoded-scan RAM cache (VERDICT r4 next-7): a padded 150k-point
        # scan is 1.8 MB, the whole synthetic train split ~6 GB — far under
        # host RAM — and each scan is decoded TWICE per epoch (frame f is
        # pc1 of pair f and pc2 of pair f+1), every epoch.  Opt-in: eval
        # paths stream sequences once and gain nothing.
        self.cache_scans = cache_scans
        self._scan_cache: dict = {}

    def __len__(self) -> int:
        return SEQ_LENGTH_TABLE[-1]

    def locate(self, index: int) -> Tuple[int, int, int]:
        """global index -> (sequence, frame t, frame t-1)."""
        for si in range(1, len(SEQ_LENGTH_TABLE)):
            if index < SEQ_LENGTH_TABLE[si]:
                seq = si - 1
                f2 = index - SEQ_LENGTH_TABLE[si - 1]
                f1 = max(f2 - 1, 0)
                return seq, f2, f1
        raise IndexError(index)

    def _t_diff(self, seq: int) -> Optional[np.ndarray]:
        if seq > 10:
            return None
        if seq not in self._t_diff_cache:
            path = os.path.join(
                self.gt_pose_dir, "kitti_T_diff", f"{SEQ_NAMES[seq]}_diff.npy"
            )
            if os.path.exists(path):
                self._t_diff_cache[seq] = np.load(path)
            else:
                # the kitti_T_diff arrays are a reference-repo precomputation;
                # a stock KITTI download only has the devkit's absolute camera
                # poses -- derive the per-pair relatives on the fly
                self._t_diff_cache[seq] = t_diff_from_poses(
                    os.path.join(self.gt_pose_dir, f"{SEQ_NAMES[seq]}.txt")
                )
        return self._t_diff_cache[seq]

    def read_scan(self, seq: int, frame: int) -> np.ndarray:
        from . import native_io

        if self.cache_scans:
            key = (seq, frame)
            hit = self._scan_cache.get(key)
            if hit is not None:
                return hit
        path = os.path.join(
            self.root, SEQ_NAMES[seq], "velodyne", f"{frame:06d}.bin"
        )
        scan = native_io.read_scan(path, self.num_points)
        if self.cache_scans:
            scan.setflags(write=False)  # shared across loader workers
            self._scan_cache[(seq, frame)] = scan
        return scan

    def __getitem__(self, index: int):
        seq, f2, f1 = self.locate(index)
        seq_dir = os.path.join(self.root, SEQ_NAMES[seq])
        tr, tr_inv = load_tr(os.path.join(seq_dir, "calib.txt"))

        pc_t = self.read_scan(seq, f2)       # frame t   ("pc1" downstream)
        pc_tm1 = self.read_scan(seq, f1)     # frame t-1 ("pc2" downstream)

        diff = self._t_diff(seq)
        if diff is None:
            t_diff = np.eye(4)
        else:
            t_diff = np.vstack(
                [diff[f2].reshape(3, 4), np.array([0.0, 0.0, 0.0, 1.0])]
            )
        t_gt = (tr_inv @ t_diff @ tr).astype(np.float32)
        return pc_t, pc_tm1, t_gt
