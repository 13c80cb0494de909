"""Tracing / profiling / observability hooks.

The reference's only observability is print() and wall-clock time around the
optimizer loop (reference models/base.py:231,288-290).  Here:

* :func:`trace` -- context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device activity;
* :func:`annotate` -- ``jax.named_scope`` wrapper so Gram / Cholesky /
  solve phases are identifiable in traces;
* :class:`StepMetrics` -- structured per-step training metrics (loss,
  grad-norm, step time) collected by the fit callbacks.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with profiling.trace("/tmp/tb"): step()``.

    View with TensorBoard's profile plugin.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for profile readability:

    >>> with profiling.annotate("gram"):
    ...     K = kernel.K(x)
    """
    return jax.named_scope(name)


@dataclass
class StepMetrics:
    """Accumulates per-step scalars during a fit loop.

    Use as a callback for :meth:`GPModel.optimize`:

    >>> metrics = StepMetrics()
    >>> model.optimize(method="Adam", callback=metrics)
    >>> metrics.losses, metrics.step_times
    """

    losses: List[float] = field(default_factory=list)
    step_times: List[float] = field(default_factory=list)
    _last: Optional[float] = None

    def __call__(self, step: int, loss: float):
        now = time.perf_counter()
        if self._last is not None:
            self.step_times.append(now - self._last)
        self._last = now
        self.losses.append(float(loss))

    def summary(self) -> dict:
        return {
            "steps": len(self.losses),
            "final_loss": self.losses[-1] if self.losses else None,
            "best_loss": min(self.losses) if self.losses else None,
            "mean_step_time_s": float(np.mean(self.step_times))
            if self.step_times
            else None,
        }


def device_memory_stats() -> dict:
    """Live/peak HBM usage of the default device (if the backend reports it)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
