"""Tracing/profiling helpers (SURVEY.md §5.1).

The reference's only observability is a smoothed-FPS metric logged to
SQLite (FluidSim.cs:609-615) plus Debug.Log prints.  Here:

* ``StepTimer`` — wall-clock step timing with percentile summaries,
  feeding the same metrics store.
* ``trace_profile`` — context manager around ``jax.profiler`` emitting an
  XPlane trace for tensorboard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


class StepTimer:
    """Accumulates per-dispatch wall times; reports p50/p90/mean."""

    def __init__(self):
        self._samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._samples.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def count(self) -> int:
        return len(self._samples)

    def summary(self, steps_per_sample=1) -> dict:
        """``steps_per_sample`` may be a scalar or a per-sample sequence
        (for a trailing partial dispatch chunk)."""
        if not self._samples:
            return {"count": 0}
        t = np.asarray(self._samples)
        per = np.broadcast_to(np.asarray(steps_per_sample, float), t.shape)
        s = t / per
        return {
            "count": len(s),
            "mean_ms": float(s.mean() * 1e3),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p90_ms": float(np.percentile(s, 90) * 1e3),
            "steps_per_sec": float(per.sum() / t.sum()),
        }

    def reset(self):
        self._samples.clear()


@contextlib.contextmanager
def trace_profile(logdir: str):
    """``with trace_profile("/tmp/trace"):`` — captures a jax.profiler
    trace viewable in TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
