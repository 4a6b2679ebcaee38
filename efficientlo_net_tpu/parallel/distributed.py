"""Multi-host runtime initialization and host-sharded evaluation.

No reference counterpart (single-GPU only, SURVEY.md C23).  Wraps
``jax.distributed`` for multi-host pods, and splits evaluation sequences
across hosts (each host integrates its own sequences; the coordinator
aggregates the metric) — the eval-sharding design called for by
BASELINE.json.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op for single-process runs."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def shard_sequences_by_host(sequences: Sequence[int],
                            process_id: Optional[int] = None,
                            num_processes: Optional[int] = None) -> List[int]:
    """Round-robin split of eval sequences across hosts."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return [s for i, s in enumerate(sequences) if i % n == pid]


def aggregate_mean_t_rel(local_results: Dict[int, object]) -> float:
    """Cross-host aggregation of the validation scalar: every host
    contributes (sum, count) and reads back the global mean."""
    import jax
    import numpy as np

    local_sum = float(np.sum([r.t_rel for r in local_results.values()])) \
        if local_results else 0.0
    local_cnt = float(len(local_results))
    if jax.process_count() == 1:
        return local_sum / max(local_cnt, 1.0)
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(np.array([local_sum, local_cnt]))
    ).reshape(-1, 2)
    total = gathered.sum(axis=0)
    return float(total[0] / max(total[1], 1.0))
