"""Profiling / tracing helpers.

The reference has no tracing (SURVEY.md §5 — wall-clock `time.time()` only).
Here: `jax.profiler` trace capture (viewable in TensorBoard/XProf/Perfetto),
named step annotations, and a simple step timer that reports steps/sec and
points/sec.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/sec + points/sec meter (prints via a supplied logger)."""

    def __init__(self, points_per_step: int, window: int = 50):
        self.pps = points_per_step
        self.window = window
        self._t0: Optional[float] = None
        self._count = 0

    def tick(self) -> Optional[dict]:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count % self.window:
            return None
        dt = now - self._t0
        self._t0, n = now, self._count
        self._count = 0
        return {
            "steps_per_sec": n / dt,
            "points_per_sec": n * self.pps / dt,
            "ms_per_step": 1000.0 * dt / n,
        }
