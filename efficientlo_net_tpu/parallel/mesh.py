"""Device mesh utilities for data-parallel (and future multi-host) training.

The reference has no distributed backend at all (single GPU pinned via
CUDA_VISIBLE_DEVICES, main.py:58).  This module is the TPU-native design:
a 1-D ``data`` mesh, batches sharded over it, parameters replicated, and XLA
inserting the gradient ``psum`` over ICI automatically from the shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host-side batch dict onto the mesh, batch-sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
