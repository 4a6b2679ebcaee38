"""EfficientLO-TPU: a TPU-native LiDAR-odometry framework.

The full capability surface of EfficientLO-Net (TPAMI 2022; reference
``main.py`` / ``pwclo_model.py``) re-designed from scratch for
JAX / XLA / Pallas / pjit, plus a distributed pose-graph / SLAM backend the
reference does not have.

Subpackages (imported lazily — importing :mod:`efficientlo_net_tpu` does not
pull in jax):

- ``config``      frozen dataclass configuration (sensor presets, levels)
- ``ops``         projection, neighbor-select kernels, quaternion algebra
- ``models``      PWCLONet, layers, losses, preprocessing
- ``data``        KITTI provider, loaders, augmentation, native C++ IO
- ``training``    train state / step / trainer / checkpointing
- ``evaluation``  KITTI RPE metrics, odometry integration, streaming
- ``parallel``    device mesh, data-parallel step, W-axis ring sharding
- ``backend``     pose graph, scan factors, sliding-window SLAM, mapping
- ``serving``     StableHLO export artifacts
"""

__version__ = "0.2.0"

__all__ = [
    "backend",
    "cli",
    "config",
    "data",
    "evaluation",
    "models",
    "ops",
    "parallel",
    "serving",
    "training",
    "utils",
    "__version__",
]


def __getattr__(name):
    if name in __all__ and name != "__version__":
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
