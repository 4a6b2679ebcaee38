"""CLI surface: flag parity + TPU-native extras parse correctly."""

from efficientlo_net_tpu.cli import build_parser


def test_reference_flag_parity_defaults():
    # reference argparse surface (main.py:30-56)
    a = build_parser().parse_args([])
    assert a.mode == "train"
    assert a.num_points == 150000
    assert (a.num_H_input, a.num_W_input) == (64, 1800)
    assert a.max_epoch == 1000
    assert a.batch_size == 8
    assert a.learning_rate == 0.001
    assert a.optimizer == "adam"
    assert (a.decay_step, a.decay_rate) == (200000, 0.7)
    assert a.train_list == list(range(7))
    assert a.val_list == list(range(7, 11))


def test_tpu_native_extras():
    a = build_parser().parse_args(
        ["--mode", "test", "--sensor", "vlp16", "--compute_dtype", "bfloat16",
         "--no_mesh", "--coordinator", "host0:1234", "--host_projection"]
    )
    assert a.mode == "test"
    assert a.sensor == "vlp16"
    assert a.compute_dtype == "bfloat16"
    assert a.no_mesh
    assert a.coordinator == "host0:1234"
    assert a.host_projection
    # default is tri-state auto (None -> on when the native projector exists)
    assert build_parser().parse_args([]).host_projection is None
    assert (
        build_parser().parse_args(["--no_host_projection"]).host_projection
        is False
    )


def test_host_projection_auto_resolution():
    from efficientlo_net_tpu.config import TrainConfig
    from efficientlo_net_tpu.data import native_io

    assert TrainConfig(host_projection=True).resolved_host_projection() is True
    assert TrainConfig(host_projection=False).resolved_host_projection() is False
    assert (
        TrainConfig(host_projection=None).resolved_host_projection()
        == native_io.available()
    )
