"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5.1 — the only timing
artifact is the 5 s poll constant). Here: lightweight stage timers that
force device synchronization (block_until_ready is unreliable on some
backends — a scalar readback is the only true sync), and a jax.profiler
trace context for TensorBoard-grade traces of the hot paths.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax
import numpy as np

log = logging.getLogger(__name__)


def sync(x) -> None:
    """Force completion of device work feeding x (scalar readback — on
    tunneled backends block_until_ready can be a no-op)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.numpy.asarray(leaves[0]).ravel()[0])


class StageTimer:
    """Accumulates wall-clock per named stage.

    with timer.stage("flow", sync_on=result): ...
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        out = _StageHandle()
        try:
            yield out
        finally:
            if out.value is not None:
                sync(out.value)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            t = self.totals[name]
            lines.append(f"{name:24s} {t:8.3f}s total  {t / max(n, 1) * 1000:8.1f} ms/call  x{n}")
        return "\n".join(lines)

    def log_report(self) -> None:
        log.info("stage timings:\n%s", self.report())


class _StageHandle:
    """Assign `.value` inside the stage to sync on it at stage exit."""

    value = None


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/videoquery_trace"):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log.info("device trace written to %s", log_dir)
