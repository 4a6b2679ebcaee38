"""Model export for deployment: serialized StableHLO inference artifacts.

Beyond-reference subsystem (the reference ships TF1 ``tf.train.Saver``
checkpoints that require the full training codebase plus compiled CUDA ops
to run, main.py:194-197).  Here the complete odometry inference function —
cylindrical projection + PWCLO forward, weights baked in as constants — is
exported with ``jax.export`` to a single self-contained StableHLO blob that
any JAX runtime can load and run *without this package*, on CPU or TPU
(``platforms`` pins the lowering targets; cross-platform artifacts embed
one module per platform).

Shapes are static (batch size and point count are fixed at export time),
matching the framework-wide static-shape design.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.projection import project_to_range_image

FILE_SUFFIX = ".stablehlo"


def make_infer_fn(model, cfg: ModelConfig, variables):
    """The production odometry inference path as a pure function of two raw
    scans: validity-mask + planar-crop (the training distribution,
    models/preprocess.py; reference model_util.py:380-383), pack-project both
    frames, run the forward, return the finest-level (l0) pose.
    ``variables`` are closed over (exported as constants)."""
    h, w = cfg.sensor.height, cfg.sensor.width

    def prep(points):
        # crop exactly like OdometryStream: uncropped far points would both
        # skew the input distribution and break the packed method's 60 m
        # quantization assumption
        valid = jnp.any(points != 0.0, axis=-1)
        keep = valid & (
            jnp.linalg.norm(points[..., :2], axis=-1)
            <= cfg.sensor.max_planar_radius
        )
        cropped = points * keep[..., None]
        img, _ = project_to_range_image(
            cropped, None, h, w, cfg.sensor, method="packed"
        )
        return img

    def infer(pc1: jnp.ndarray, pc2: jnp.ndarray):
        out = model.apply(variables, prep(pc1), prep(pc2), training=False)
        return out["q"][0], out["t"][0]

    return infer


def export_odometry(
    model,
    cfg: ModelConfig,
    variables,
    batch_size: int = 1,
    num_points: Optional[int] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> bytes:
    """Serialize the full inference function to a StableHLO artifact.

    Returns the serialized bytes; write them with ``save_artifact`` or
    ``bytes.decode``-free file IO.  ``num_points`` defaults to the sensor's
    padded scan size.
    """
    n = num_points or cfg.sensor.num_points
    spec = jax.ShapeDtypeStruct((batch_size, n, 3), jnp.float32)
    infer = make_infer_fn(model, cfg, variables)
    # the Pallas neighbor kernels lower only for the tpu platform; a
    # portable artifact must trace the pure-XLA formulation (the neighbor
    # impl is chosen at trace time from ELO_NEIGHBOR_IMPL / the backend, so
    # exporting from a TPU-backed session would otherwise bake in Pallas
    # and fail the cpu lowering)
    portable = any(p != "tpu" for p in platforms)
    prev = os.environ.get("ELO_NEIGHBOR_IMPL")
    if portable:
        os.environ["ELO_NEIGHBOR_IMPL"] = "fast"
    try:
        exp = jax.export.export(jax.jit(infer), platforms=tuple(platforms))(
            spec, spec
        )
    finally:
        if portable:
            if prev is None:
                os.environ.pop("ELO_NEIGHBOR_IMPL", None)
            else:
                os.environ["ELO_NEIGHBOR_IMPL"] = prev
    return exp.serialize()


def save_artifact(path: str, blob: bytes) -> str:
    if not path.endswith(FILE_SUFFIX):
        path = path + FILE_SUFFIX
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_odometry(path_or_blob) -> Tuple[object, callable]:
    """Load a serialized artifact; returns ``(exported, call)`` where
    ``call(pc1, pc2) -> (q, t)`` runs on the current default backend."""
    if isinstance(path_or_blob, (bytes, bytearray)):
        blob = bytes(path_or_blob)
    else:
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(blob)

    def call(pc1, pc2):
        return exported.call(jnp.asarray(pc1), jnp.asarray(pc2))

    return exported, call
