"""Chunked long-training driver for the synthetic drive.

Executes a long training run as a series of fresh processes
(``synthetic_drive.py --stage train --resume``) so the axon remote-TPU
client's per-transfer host-memory leak (docs/axon_transfer_leak.md) never
accumulates past a chunk, and records a learning-curve point
(``--stage eval``) at each milestone epoch count.

Run: python tools/long_train.py [--milestones 30,60,100,...] [--chunk 25]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def epochs_completed(log_dir: str) -> int:
    best = -1
    for m in glob.glob(os.path.join(log_dir, "checkpoints", "meta_*.json")):
        try:
            with open(m) as f:
                e = json.load(f).get("epoch")
            if e is not None:
                best = max(best, int(e))
        except (OSError, ValueError):
            pass
    return best + 1


def run(cmd: list, retries: int = 1) -> None:
    for attempt in range(retries + 1):
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode == 0:
            return
        print(f"exit {r.returncode} (attempt {attempt + 1})", flush=True)
        time.sleep(10)
    raise SystemExit(f"command kept failing: {' '.join(cmd)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--milestones", default="30,60,100,150,200,250,300")
    ap.add_argument("--chunk", type=int, default=25,
                    help="max epochs per training process (leak bound)")
    ap.add_argument("--log_dir", default="/root/drive_data/log")
    args = ap.parse_args()

    base = [sys.executable, "-u", os.path.join("tools", "synthetic_drive.py")]
    t0 = time.time()
    for m in [int(x) for x in args.milestones.split(",")]:
        while (cur := epochs_completed(args.log_dir)) < m:
            target = min(cur + args.chunk, m)
            run(base + ["--stage", "train", "--resume",
                        "--epochs", str(target)])
        run(base + ["--stage", "eval", "--epochs", str(m)])
        print(f"milestone {m} done ({time.time() - t0:.0f}s)", flush=True)
    print(f"long train complete in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
