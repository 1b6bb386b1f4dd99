"""Tracing/profiling hooks.

The reference's observability is ad-hoc time.time() prints (SURVEY §5).
Here: ``jax.profiler`` traces (viewable in TensorBoard/XProf/Perfetto),
named scopes for the hot stages, and a simple wall-clock stage timer whose
semantics survive the remote-TPU runtime's dedup of identical dispatches
(time with CHAINED inputs; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str = "outputs/profile"):
    """Capture a device trace: `with profiling.trace(): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in traces: `with profiling.annotate("sweep"):`"""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage accumulator (blocks on device results)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        return ", ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1000:.1f}ms"
            for k in sorted(self.totals))
