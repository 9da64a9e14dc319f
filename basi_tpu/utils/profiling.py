"""Tracing/profiling (SURVEY §5.1).

The reference has only ad-hoc ``time.time()`` prints. Here: ``jax.profiler``
traces (Perfetto/XPlane-compatible) around named scopes for ingest /
forward / postproc, exposed as a ``--profile`` flag on both entrypoints,
plus a lightweight step timer for the JSONL metrics.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def maybe_trace(enabled: bool, out_dir: str):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA step timer; call mark() once per step after block_until_ready."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: float | None = None
        self._last: float | None = None

    def mark(self) -> float:
        now = time.perf_counter()
        ms = 0.0
        if self._last is not None:
            ms = (now - self._last) * 1000.0
            self.ema_ms = ms if self.ema_ms is None else (
                self.alpha * ms + (1 - self.alpha) * self.ema_ms
            )
        self._last = now
        return ms
