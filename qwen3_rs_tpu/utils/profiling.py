"""Profiling helpers — the tracing subsystem (SURVEY §5: the reference has
only a tokens/sec printout; here: jax.profiler traces + step timing)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/xplane format) around a
    region when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Rolling per-step wall-clock stats for engine loops."""

    def __init__(self):
        self.samples: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.samples.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        if not self.samples:
            return {"steps": 0}
        s = sorted(self.samples)
        n = len(s)
        return {
            "steps": n,
            "mean_ms": sum(s) / n * 1000,
            "p50_ms": s[n // 2] * 1000,
            "p99_ms": s[min(n - 1, int(n * 0.99))] * 1000,
        }
