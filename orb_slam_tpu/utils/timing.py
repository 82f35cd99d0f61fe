"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5: DUtils::Timestamp unused, g2o batch
stats disabled). Here: a per-stage wall-clock timer with device sync, and a
context manager around jax.profiler for full XLA traces."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def force_value(result):
    """Synchronize by VALUE READBACK. On the axon remote-TPU runtime,
    `jax.block_until_ready` returns immediately without waiting for the
    device (PERF.md); transferring the bytes to the host is the only
    reliable sync, and it is what this helper does for every array leaf."""
    import numpy as _np

    for leaf in jax.tree.leaves(result):
        if hasattr(leaf, "dtype"):
            _np.asarray(leaf)


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
            force_value(result)
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


def dispatch_fused(fn):
    """Wrap `fn` in a 1-iteration lax.scan.

    On runtimes where each top-level op execution carries a fixed dispatch
    overhead (measured ~ms through remote-device tunnels), a program of N
    ops costs N*overhead; inside a scan body the ops execute on-device as
    one unit. Measured on this target: a 480x640 FAST stencil drops from
    ~18000 ms (80 top-level ops, uncached) to 4.6 ms scan-wrapped — with
    identical results. Semantically a no-op; compose INSIDE jit:
    jax.jit(dispatch_fused(f))."""
    import functools

    import jax.numpy as jnp

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        def body(carry, _):
            return carry, fn(*args, **kwargs)

        _, out = jax.lax.scan(body, 0, jnp.arange(1))
        return jax.tree.map(lambda x: x[0], out)

    return wrapped


@contextlib.contextmanager
def trace_to(logdir: str):
    """XLA profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
