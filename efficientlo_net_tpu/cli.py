"""Command-line driver.

Flag-for-flag parity with the reference argparse surface (main.py:30-56):
mode/train/test, data_root, checkpoint_path, log_dir, result_dir, sequence
lists, num_points, H/W, max_epoch, batch_size, learning_rate, optimizer,
decay schedule — plus TPU-native extras (mesh on/off).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native EfficientLO")
    p.add_argument("--mode", default="train", choices=["train", "test"])
    p.add_argument("--data_root", default="../", help="KITTI odometry dataset dir")
    p.add_argument("--gt_dir", default=None, help="ground-truth pose dir")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--log_dir", default="log")
    p.add_argument("--result_dir", default="result")
    p.add_argument("--train_list", nargs="+", type=int, default=list(range(7)))
    p.add_argument("--val_list", nargs="+", type=int, default=list(range(7, 11)))
    p.add_argument("--test_list", nargs="+", type=int, default=list(range(11)))
    p.add_argument("--num_points", type=int, default=150000)
    p.add_argument("--num_H_input", type=int, default=64)
    p.add_argument("--num_W_input", type=int, default=1800)
    p.add_argument("--max_epoch", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--optimizer", default="adam", choices=["adam", "momentum"])
    p.add_argument("--decay_step", type=int, default=200000)
    p.add_argument("--decay_rate", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--sensor", default=None,
        help="sensor preset name (hdl64/hdl32e/vlp16/os1_64); overrides "
             "num_points/num_H_input/num_W_input",
    )
    p.add_argument(
        "--compute_dtype", default="float32", choices=["float32", "bfloat16"],
        help="MLP compute dtype (pose heads / BN stats stay f32); see "
             "docs/bf16_perf.md for the measured trade-off",
    )
    p.add_argument(
        "--host_projection", action="store_true", default=None,
        help="project range images on the host (native C++ projector) inside "
             "the loader workers; the device train step consumes dense "
             "images, freeing ~30%% of its time (docs/perf_breakdown.json). "
             "Default: auto — on when the native projector is available",
    )
    p.add_argument(
        "--no_host_projection", dest="host_projection", action="store_false",
        help="force the on-device input projections even when the native "
             "host projector is available",
    )
    p.add_argument(
        "--quantized_transfer", action="store_true",
        help="ship batches host->device as int16 (1.25 mm LSB, far below "
             "sensor noise): halves the transfer bandwidth",
    )
    p.add_argument(
        "--pretrained", default=None,
        help="portable weight artifact (efficientlo_net_tpu.pretrained) to "
             "load into the model — weights-only alternative to "
             "--checkpoint_path (which restores full training state)",
    )
    p.add_argument("--no_mesh", action="store_true", help="disable multi-device DP")
    p.add_argument(
        "--coordinator", default=None,
        help="multi-host: jax.distributed coordinator address "
             "(or set JAX_COORDINATOR_ADDRESS)",
    )
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from .config import ModelConfig, SensorConfig, TrainConfig, sensor_preset
    from .parallel.distributed import initialize_distributed
    from .training.trainer import Trainer

    initialize_distributed(args.coordinator)

    if args.sensor is not None:
        sensor = sensor_preset(args.sensor)
    else:
        sensor = SensorConfig(
            height=args.num_H_input, width=args.num_W_input,
            num_points=args.num_points,
        )
    model_cfg = ModelConfig(sensor=sensor, compute_dtype=args.compute_dtype)
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        base_learning_rate=args.learning_rate,
        lr_decay_step=args.decay_step,
        lr_decay_rate=args.decay_rate,
        optimizer=args.optimizer,
        momentum=args.momentum,
        max_epoch=args.max_epoch,
        host_projection=args.host_projection,
        quantized_transfer=args.quantized_transfer,
    )

    log_dir = args.log_dir + datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    trainer = Trainer(
        model_cfg,
        train_cfg,
        data_root=args.data_root,
        log_dir=log_dir,
        gt_dir=args.gt_dir,
        train_list=args.train_list,
        val_list=args.val_list if args.mode == "train" else args.test_list,
        seed=args.seed,
        use_mesh=not args.no_mesh,
    )

    if args.checkpoint_path:
        # restores state AND epoch metadata, so warm-started training
        # resumes at the right epoch instead of epoch 0
        trainer.restore(path=args.checkpoint_path)
    if args.pretrained:
        trainer.load_pretrained(args.pretrained)

    if args.mode == "train":
        trainer.fit()
    else:
        if not (args.checkpoint_path or args.pretrained):
            trainer.logger.log("warning: testing with random weights "
                               "(no --checkpoint_path / --pretrained)")
        from .evaluation.runner import evaluate_sequences
        import jax

        evaluate_sequences(
            trainer.eval_step,
            jax.device_get(trainer.state.params),
            jax.device_get(trainer.state.batch_stats),
            trainer.dataset,
            args.test_list,
            gt_dir=trainer.gt_dir,
            result_dir=args.result_dir,
            batch_size=args.batch_size,
            log=trainer.logger.log,
            stream_fns=trainer.stream_eval_fns,
        )


if __name__ == "__main__":
    main()
