"""Tracing / profiling / structured training logs.

The reference's observability is wall-clock prints plus an in-memory history
dict (ref: uncertainty_guided_trainer.py:349,370 and :70-79); its
requirements pin tensorboard without ever importing it, and its README
promises a ``training_log.csv`` that is never written (ref: README.md:167).
This module supplies the real versions, TPU-style:

* ``trace``: context manager around ``jax.profiler.trace`` — produces
  TensorBoard-loadable XPlane traces of the fused train steps.
* ``annotate``: ``jax.profiler.TraceAnnotation`` pass-through for named
  host-side regions.
* ``StepTimer``: cheap per-step wall timing with EMA + percentile summary
  (device work is async; time whole steps, not ops).
* ``CSVLogger``: the promised ``training_log.csv``, one row per epoch.
"""

from __future__ import annotations

import contextlib
import csv
import time
from pathlib import Path

import numpy as np

__all__ = ["trace", "annotate", "StepTimer", "CSVLogger"]


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace into ``log_dir`` (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with EMA and summary statistics."""

    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self.ema: float | None = None
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.ema = dt if self.ema is None else (
            self._ema_coef * self.ema + (1 - self._ema_coef) * dt
        )
        return False

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "total_s": float(arr.sum()),
        }


class CSVLogger:
    """Append-only CSV with a fixed header (training_log.csv)."""

    def __init__(self, path: str | Path, fieldnames: list[str]):
        self.path = Path(path)
        self.fieldnames = list(fieldnames)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if not self.path.exists():
            with open(self.path, "w", newline="") as f:
                csv.DictWriter(f, fieldnames=self.fieldnames).writeheader()

    def log(self, **row):
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self.fieldnames).writerow(
                {k: row.get(k, "") for k in self.fieldnames}
            )
