"""Chunked long-training driver for the synthetic drive.

Executes a long training run as a series of fresh processes
(``synthetic_drive.py --stage train --resume``) so the axon remote-TPU
client's per-transfer host-memory leak (docs/axon_transfer_leak.md) never
accumulates past a chunk.  At each milestone epoch count it records a
VALIDATION point (``--stage val``, the selection drive) and a learning-curve
point (``--stage eval``, the untouched eval/holdout drives).  Checkpoint
selection reads ONLY the validation history — mirroring the reference's
val/test separation (main.py:227-249).

Run: python tools/long_train.py [--milestones 30,60,...] [--chunk 25]
     [--deadline_s 14400] [--select]
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


def run(cmd: list, retries: int = 5) -> None:
    for attempt in range(retries + 1):
        print("+", " ".join(cmd), flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        if r.returncode == 0:
            return
        print(f"exit {r.returncode} (attempt {attempt + 1})", flush=True)
        time.sleep(10)
    raise SystemExit(f"command kept failing: {' '.join(cmd)}")


def best_val_epoch() -> tuple:
    """(epochs, t_rel) of the best validation point recorded so far."""
    path = os.path.join(REPO, "docs", "synthetic_drive.json")
    with open(path) as f:
        hist = json.load(f).get("val_history", [])
    if not hist:
        raise SystemExit("no val_history — run milestones first")
    best = min(hist, key=lambda h: h["t_rel"])
    return int(best["epochs"]), float(best["t_rel"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--milestones", default="30,60,100,140,170,200,225")
    ap.add_argument("--chunk", type=int, default=25,
                    help="max epochs per training process (leak bound)")
    ap.add_argument("--log_dir", default="/root/drive_data/log")
    ap.add_argument("--deadline_s", type=int, default=0,
                    help="stop starting new chunks after this many seconds "
                         "(0 = no deadline); milestones already reached "
                         "keep their val/eval points")
    ap.add_argument("--extra", default="",
                    help="extra args passed to every synthetic_drive.py "
                         "invocation (e.g. '--lr_decay_step 70000')")
    ap.add_argument("--select", action="store_true",
                    help="after the milestone loop: print the best epoch by "
                         "val t_rel (selection signal only)")
    args = ap.parse_args()

    base = [sys.executable, "-u", os.path.join("tools", "synthetic_drive.py")]
    extra = args.extra.split() if args.extra else []
    t0 = time.time()
    stopped = False

    def milestone_recorded(m):
        """True if this milestone's val point already exists — a restarted
        driver (supervisor recovery) must not re-run finished stages."""
        path = os.path.join(REPO, "docs", "synthetic_drive.json")
        try:
            with open(path) as f:
                hist = json.load(f).get("val_history", [])
        except (OSError, ValueError):
            return False
        return any(h.get("epochs") == m for h in hist)

    for m in [int(x) for x in args.milestones.split(",")]:
        if milestone_recorded(m) and epochs_completed(args.log_dir) >= m:
            print(f"milestone {m} already recorded — skipping", flush=True)
            continue
        while (cur := epochs_completed(args.log_dir)) < m:
            if args.deadline_s and time.time() - t0 > args.deadline_s:
                print(f"deadline reached at epoch {cur} — stopping before "
                      f"milestone {m}", flush=True)
                stopped = True
                break
            target = min(cur + args.chunk, m)
            run(base + ["--stage", "train", "--resume",
                        "--epochs", str(target)] + extra)
        if stopped:
            break
        run(base + ["--stage", "val", "--epochs", str(m)] + extra)
        run(base + ["--stage", "eval", "--epochs", str(m)] + extra)
        # snapshot a portable artifact: the checkpoint manager keeps only
        # the last few epoch checkpoints, and selection may pick ANY
        # milestone after the fact
        run([sys.executable, "-u", os.path.join("tools", "export_pretrained.py"),
             "--name", "synthetic_drive"])
        print(f"milestone {m} done ({time.time() - t0:.0f}s)", flush=True)
    if args.select:
        ep, tr = best_val_epoch()
        print(json.dumps({"selected_epochs": ep, "val_t_rel": tr}), flush=True)
    print(f"long train complete in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
