"""Profiling hooks: JAX/xprof trace capture + per-step timing (SURVEY §5 —
the reference has no tracing; the rebuild wires the JAX profiler into the
trainer)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an xprof trace for the enclosed steps (view with xprof/TensorBoard)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats; call ``tick()`` after each synced step."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.n = 0
        self.total = 0.0
        self.last: Optional[float] = None
        self._t = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        self.last = dt
        self.n += 1
        if self.n > self.warmup:
            self.total += dt
        return dt

    @property
    def mean(self) -> float:
        steps = max(self.n - self.warmup, 1)
        return self.total / steps

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean if self.mean > 0 else 0.0

    def summary(self, batch_size: int) -> Dict[str, float]:
        return {"step_time_s": self.mean, "images_per_sec": self.images_per_sec(batch_size)}
