"""Portable pretrained-weight artifacts.

The reference ships ``pretrained_model/`` TF1 checkpoints (main.py:194-197)
— which its own repo broke by dropping the 90 MB data blob
(``.MISSING_LARGE_BLOBS``), leaving only the variable index.  Here the
trained model is a single self-describing msgpack file small enough to
version with the code: the inference variables (params + batch_stats, f32
numpy) plus a JSON metadata header (training provenance, eval metrics,
model-config summary) so a loaded artifact can be sanity-checked against
the constructing config before use.

Unlike ``training.checkpoint`` (orbax, full train state, resume metadata)
this stores only what inference / fine-tune warm-starts need; unlike
``serving.export`` (StableHLO, weights baked into a compiled artifact) the
result stays a JAX pytree usable with ``PWCLONet.apply``, OdometryStream,
the evaluation runner, and the SLAM frontend.

Format: msgpack map {"meta": <json str>, "variables": <flax-serialized>}.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

FORMAT_VERSION = 1


def _to_host_f32(tree):
    """Materialize on host as float32 numpy (drops device placement and any
    accidental f64 so artifacts are platform-independent and compact)."""
    def conv(x):
        a = np.asarray(jax.device_get(x))
        return a.astype(np.float32) if a.dtype == np.float64 else a

    return jax.tree_util.tree_map(conv, tree)


def variables_from_train_state(state) -> Dict[str, Any]:
    """Inference variables from a ``TrainState``: unwraps the trainer's
    ``{"model", "w_x", "w_q"}`` params wrapping (training/state.py:75-79)
    into the ``{"params", "batch_stats"}`` dict every inference surface
    (``model.apply``, OdometryStream, evaluate_sequences, serving export)
    expects."""
    p = jax.device_get(state.params)
    return {
        "params": p["model"] if isinstance(p, dict) and "model" in p else p,
        "batch_stats": jax.device_get(state.batch_stats),
    }


def save_pretrained(
    path: str,
    variables: Dict[str, Any],
    meta: Optional[Dict[str, Any]] = None,
) -> int:
    """Write ``variables`` (a dict with at least "params"; typically also
    "batch_stats") plus ``meta`` to ``path``.  Returns the file size in
    bytes."""
    import msgpack
    from flax import serialization

    keep = {k: _to_host_f32(v) for k, v in variables.items()
            if k in ("params", "batch_stats")}
    if "params" not in keep:
        raise ValueError("variables must contain 'params'")
    header = dict(meta or {})
    header["format_version"] = FORMAT_VERSION
    header["param_count"] = int(
        sum(x.size for x in jax.tree_util.tree_leaves(keep["params"]))
    )
    blob = msgpack.packb({
        "meta": json.dumps(header),
        "variables": serialization.msgpack_serialize(keep),
    })
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_pretrained(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read an artifact: returns ``(variables, meta)`` where ``variables``
    is ready for ``model.apply(variables, ...)``."""
    import msgpack
    from flax import serialization

    with open(path, "rb") as f:
        blob = msgpack.unpackb(f.read())
    meta = json.loads(blob["meta"])
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta['format_version']} is newer than this "
            f"library supports ({FORMAT_VERSION})"
        )
    variables = serialization.msgpack_restore(blob["variables"])
    return variables, meta
