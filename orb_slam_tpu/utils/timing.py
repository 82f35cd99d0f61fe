"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5: DUtils::Timestamp unused, g2o batch
stats disabled). Here: a per-stage wall-clock timer with device sync, and a
context manager around jax.profiler for full XLA traces."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates per-stage wall times (with optional device sync)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def record(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def __str__(self):
        return "\n".join(
            f"{k:30s} {v['mean_ms']:9.3f} ms x{v['count']}"
            for k, v in self.summary().items()
        )


@contextlib.contextmanager
def trace_to(logdir: str):
    """XLA profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
