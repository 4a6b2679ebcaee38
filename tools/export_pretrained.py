"""Export the trained synthetic-drive model as a portable in-repo artifact.

Restores the latest (or ``--step``) checkpoint from the drive-training log
dir and writes ``pretrained/<name>.msgpack`` via
``efficientlo_net_tpu.pretrained`` with provenance + the current eval
metrics from docs/synthetic_drive.json baked into the header — so the next
round (or any user) can run eval / streaming / SLAM without the 4-hour
retrain.

Run: python tools/export_pretrained.py [--name synthetic_drive]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/drive_data/dataset")
    ap.add_argument("--gt_dir", default="/root/drive_data/ground_truth_pose")
    ap.add_argument("--log_dir", default="/root/drive_data/log")
    ap.add_argument("--name", default="synthetic_drive")
    ap.add_argument("--step", type=int, default=None,
                    help="specific checkpoint step (default: latest)")
    args = ap.parse_args()

    # restore on CPU: the artifact is host numpy either way, and this must
    # not contend with a training run on the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    from efficientlo_net_tpu.config import ModelConfig, TrainConfig
    from efficientlo_net_tpu.pretrained import (
        save_pretrained, variables_from_train_state)
    from efficientlo_net_tpu.training.checkpoint import CheckpointManager
    from efficientlo_net_tpu.training.state import create_train_state
    from efficientlo_net_tpu.models.pwclo import PWCLONet

    cfg = ModelConfig()
    model = PWCLONet(cfg)
    tcfg = TrainConfig(batch_size=8)
    state = create_train_state(model, cfg, tcfg, jax.random.key(0))
    mgr = CheckpointManager(os.path.join(args.log_dir, "checkpoints"))
    state = mgr.restore(state, step=args.step)
    epoch = mgr.metadata(step=args.step).get("epoch")
    epochs = (int(epoch) + 1) if epoch is not None else None
    print(f"restored step {int(state.step)} (epoch {epoch})", flush=True)

    meta = {
        "model": "PWCLONet",
        "sensor": "HDL-64 64x1800, 150k points",
        "trained_epochs": epochs,
        "train_data": "synthetic drives (tools/synthetic_drive.py)",
        "step": int(state.step),
    }
    drive_json = os.path.join(REPO, "docs", "synthetic_drive.json")
    if os.path.exists(drive_json):
        with open(drive_json) as f:
            d = json.load(f)
        for k in ("odometry", "odometry_holdout"):
            if k in d:
                meta[f"eval_{k}"] = d[k]

    out_dir = os.path.join(REPO, "pretrained")
    os.makedirs(out_dir, exist_ok=True)
    suffix = f"_{epochs}ep" if epochs is not None else ""
    path = os.path.join(out_dir, f"{args.name}{suffix}.msgpack")
    size = save_pretrained(path, variables_from_train_state(state), meta)
    print(f"wrote {path} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
