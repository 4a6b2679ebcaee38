"""Configuration dataclasses for the TPU-native EfficientLO framework.

The reference (``/root/reference``) hard-codes every hyperparameter as a
literal inside the graph-builder (``pwclo_model.py:38-50``) and the sensor
intrinsics inside the projection (``model_util.py:192-199``).  Here everything
lives in frozen dataclasses so models are parameterizable (tiny configs for
CPU tests, full HDL-64 config for KITTI).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Cylindrical range-image sensor model (Velodyne HDL-64 by default).

    Mirrors the constants in reference ``model_util.py:189-200``.
    """

    height: int = 64
    width: int = 1800
    vertical_fov_up_deg: float = 2.0
    vertical_fov_down_deg: float = -24.8
    max_planar_radius: float = 35.0  # 35 m crop, reference model_util.py:380-383
    num_points: int = 150000  # zero-padded scan size, reference main.py:44

    @property
    def azimuth_resolution(self) -> float:
        return (360.0 / self.width) * math.pi / 180.0

    @property
    def vertical_resolution(self) -> float:
        up = self.vertical_fov_up_deg * math.pi / 180.0
        down = self.vertical_fov_down_deg * math.pi / 180.0
        return (up - down) / (self.height - 1)

    @property
    def vertical_pixel_offset(self) -> float:
        down = self.vertical_fov_down_deg * math.pi / 180.0
        return -down / self.vertical_resolution


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """PWCLO network hyperparameters.

    Defaults reproduce reference ``pwclo_model.py:38-50`` and the per-layer
    call sites (``pwclo_model.py:126-433``).
    """

    sensor: SensorConfig = dataclasses.field(default_factory=SensorConfig)

    # Stride pyramid: levels pre1, pre2, l0, l1, l2, l3 (pwclo_model.py:42-43).
    stride_h: Tuple[int, ...] = (1, 1, 4, 2, 2, 1)
    stride_w: Tuple[int, ...] = (1, 1, 8, 2, 2, 2)

    # Radii (pwclo_model.py:38-40).
    down_conv_dis: Tuple[float, ...] = (0.5, 3.0, 6.0, 12.0)
    up_conv_dis: Tuple[float, ...] = (3.0, 6.0, 9.0)
    cost_volume_dis: Tuple[float, ...] = (1.0, 2.0, 4.0)

    # Siamese set-conv pyramid (pwclo_model.py:126-139).
    down_kernels: Tuple[Tuple[int, int], ...] = ((9, 15), (7, 11), (5, 9), (5, 9))
    down_K: Tuple[int, ...] = (32, 32, 16, 16)
    down_mlps: Tuple[Tuple[int, ...], ...] = (
        (8, 8, 16),
        (16, 16, 32),
        (32, 32, 64),
        (64, 64, 128),
    )

    # Cost volumes.  kernel1 is the self-aggregation window (pwclo_model call
    # sites pass kernel_size1=[3,5] everywhere); kernel2 per refinement level
    # l0/l1/l2 plus the coarse "origin" correlation at l2
    # (pwclo_model.py:170-172, 242-244, 316-318, 390-392).
    cv_kernel1: Tuple[int, int] = (3, 5)
    cv_kernel2: Tuple[Tuple[int, int], ...] = ((11, 41), (7, 25), (5, 15), (5, 35))
    cv_nsample: int = 4
    cv_nsample_q: Tuple[int, ...] = (6, 6, 6, 32)
    cv_mlp1: Tuple[int, ...] = (128, 64, 64)
    cv_mlp2: Tuple[int, ...] = (128, 64)

    # The down_conv that pools the coarse cost volume to l3
    # (pwclo_model.py:177-178).
    cv_down_mlp: Tuple[int, ...] = (128, 64, 64)

    # up_conv layers (pwclo_model.py:247-251 etc.).
    up_kernel: Tuple[int, int] = (7, 15)
    up_nsample: int = 8
    up_mlp1: Tuple[int, ...] = (128, 64)
    up_mlp2: Tuple[int, ...] = (128, 64)

    # flow_predictor MLPs (pwclo_model.py:187, 253-254 etc.).
    predictor_mlp: Tuple[int, ...] = (128, 64)

    # Pose head (pwclo_model.py:197-208).
    head_dim: int = 256
    dropout_rate: float = 0.5

    # Compute dtype for the MLP stacks ("float32" or "bfloat16").  Pose heads
    # and quaternion algebra always run in float32.
    compute_dtype: str = "float32"

    # --- derived level geometry -------------------------------------------
    @property
    def level_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """(H, W) for levels [pre1, pre2, l0, l1, l2, l3].

        Reproduces the ceil-division chain in reference pwclo_model.py:45-50.
        """
        h = _ceil_div(self.sensor.height, self.stride_h[0])
        w = _ceil_div(self.sensor.width, self.stride_w[0])
        shapes = [(h, w)]
        for i in range(1, 6):
            h = _ceil_div(h, self.stride_h[i])
            w = _ceil_div(w, self.stride_w[i])
            shapes.append((h, w))
        return tuple(shapes)

    def validate(self) -> None:
        assert len(self.level_shapes) == 6


def tiny_model_config(height: int = 16, width: int = 128, num_points: int = 2048) -> ModelConfig:
    """A scaled-down config for CPU tests and multi-chip dry runs."""
    sensor = SensorConfig(height=height, width=width, num_points=num_points)
    return ModelConfig(
        sensor=sensor,
        stride_h=(1, 1, 2, 2, 1, 1),
        stride_w=(1, 1, 4, 2, 2, 2),
        down_kernels=((3, 5), (3, 5), (3, 3), (3, 3)),
        down_K=(8, 8, 4, 4),
        down_mlps=((4, 4, 8), (8, 8, 16), (16, 16, 32), (32, 32, 64)),
        cv_kernel1=(3, 3),
        cv_kernel2=((3, 7), (3, 5), (3, 3), (3, 5)),
        cv_nsample=4,
        cv_nsample_q=(4, 4, 4, 8),
        cv_mlp1=(32, 16, 16),
        cv_mlp2=(32, 16),
        cv_down_mlp=(32, 16, 16),
        up_kernel=(3, 5),
        up_nsample=4,
        up_mlp1=(32, 16),
        up_mlp2=(32, 16),
        predictor_mlp=(32, 16),
        head_dim=64,
    )


# Common spinning-LiDAR models as projection presets.  The reference is
# HDL-64-only (intrinsics hard-coded in model_util.py:192-199); here the
# whole pipeline reads the sensor model from config, so other sensors are a
# preset away.  The *network* defaults (strides/kernels/radii) are tuned for
# the 64x1800 grid — for much coarser sensors, shrink the pyramid the way
# ``tiny_model_config`` does.
SENSOR_PRESETS = {
    "hdl64": SensorConfig(),
    "hdl32e": SensorConfig(
        height=32, width=1800,
        vertical_fov_up_deg=10.67, vertical_fov_down_deg=-30.67,
        num_points=80000,
    ),
    "vlp16": SensorConfig(
        height=16, width=1800,
        vertical_fov_up_deg=15.0, vertical_fov_down_deg=-15.0,
        num_points=40000,
    ),
    "os1_64": SensorConfig(
        height=64, width=1024,
        vertical_fov_up_deg=16.6, vertical_fov_down_deg=-16.6,
        num_points=70000,
    ),
}


def sensor_preset(name: str) -> SensorConfig:
    try:
        return SENSOR_PRESETS[name]
    except KeyError:
        raise ValueError(
            f"unknown sensor preset {name!r}; have {sorted(SENSOR_PRESETS)}"
        ) from None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference main.py:44-108)."""

    batch_size: int = 8
    base_learning_rate: float = 1e-3
    lr_decay_step: int = 200000  # in samples
    lr_decay_rate: float = 0.7
    lr_floor: float = 1e-5
    optimizer: str = "adam"  # "adam" | "momentum"
    momentum: float = 0.9
    max_epoch: int = 1000

    # BN decay schedule (reference main.py:105-108,130-138).
    bn_init_decay: float = 0.5
    bn_decay_rate: float = 0.5
    bn_decay_step: int = 200000
    bn_decay_clip: float = 0.99

    # Learned homoscedastic loss weights init (reference main.py:151-152).
    w_x_init: float = 0.0
    w_q_init: float = -2.5

    # int16 point transfer (data/loader.py quantize_points): halves the
    # host->device bytes at 1.25 mm quantization — far below sensor noise.
    quantized_transfer: bool = False

    # Host-projected training (data/host_preprocess.py): loader workers
    # crop/augment/project on CPU (native C++ projector) and the device step
    # consumes dense range images — removes the scatter-bound input
    # projections (~30% of device step time) from the TensorCore.
    # None = auto: on when the native projector is importable (the measured
    # 27% train-step win, docs/perf_breakdown.json, should not hide behind a
    # flag); the numpy fallback projector would bottleneck the loader, so
    # auto stays off without the native library.
    host_projection: Optional[bool] = None

    # Decoded-scan RAM cache in the training dataset (data/kitti.py): each
    # scan is decoded twice per epoch, every epoch; the whole split fits in
    # host RAM at ~1.8 MB/scan.
    cache_decoded_scans: bool = True

    def resolved_host_projection(self) -> bool:
        """Tri-state resolution of ``host_projection`` (None = auto)."""
        if self.host_projection is not None:
            return self.host_projection
        from .data import native_io

        return native_io.available()

    def learning_rate(self, step: int):
        """Staircase exponential decay on samples seen (main.py:120-128)."""
        import jax.numpy as jnp

        samples = step * self.batch_size
        lr = self.base_learning_rate * self.lr_decay_rate ** (samples // self.lr_decay_step)
        return jnp.maximum(lr, self.lr_floor)

    def bn_momentum(self, step: int):
        """BN EMA decay for this step (main.py:130-138).

        Returns the `decay` used by the moving-average update
        ``ema = decay * ema + (1 - decay) * batch_stat``.
        """
        import jax.numpy as jnp

        samples = step * self.batch_size
        mom = self.bn_init_decay * self.bn_decay_rate ** (samples // self.bn_decay_step)
        return jnp.minimum(self.bn_decay_clip, 1.0 - mom)
