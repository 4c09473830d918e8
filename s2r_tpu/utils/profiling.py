"""Profiling / tracing hooks.

The reference has no tracing or profiling at all (SURVEY.md §5 — tqdm bars
only).  Here:
- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard-loadable XPlane trace of the jitted steps (TPU timeline, HLO
  cost attribution).
- `StepTimer`: cheap wall-clock step timing with percentile summary, no
  device synchronization beyond what the caller already does.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {"steps": len(arr),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3)}
