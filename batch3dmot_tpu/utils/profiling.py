"""Profiling hooks and step timers.

The reference has no tracing at all (SURVEY.md §5 — only tqdm bars). Here:
``profile_trace`` wraps ``jax.profiler`` for TensorBoard-viewable device
traces, ``annotate`` scopes named regions, and ``StepTimer`` gives cheap
wall-clock step statistics without device syncs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.array(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }
