"""Profiling / tracing utilities.

Reference equivalent: the commented-out chrome-trace timeline hooks and
per-batch wall-clock prints (main.py:369-390, SURVEY.md §5).  TPU-native:
``jax.profiler`` traces viewable in XProf/TensorBoard, plus a lightweight
step timer that respects async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard's profile plugin or xprof.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing that forces completion of a representative
    output (async dispatch otherwise under-reports)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.history = []

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_array=None) -> float:
        import jax

        if sync_array is not None:
            jax.block_until_ready(sync_array)
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)


def annotate(name: str):
    """Named region visible in profiler traces
    (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
