"""Profiling: jax.profiler traces + per-step timing hooks.

The reference's tracing surface is Lightning's (commented) simple profiler and
ad-hoc ``time.time()`` loops (SURVEY.md section 5); here profiling is a
first-class module: ``trace()`` wraps a region in a jax profiler trace viewable
in TensorBoard/Perfetto, and ``StepTimer`` collects per-step wall times with
percentile summaries.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/tdt_profile"):
    """jax.profiler trace context; open the dir in TensorBoard or xprof."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield Path(log_dir)
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    times: list[float] = field(default_factory=list)
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "total_s": float(arr.sum()),
        }
