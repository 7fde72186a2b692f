"""Profiling and tracing hooks.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
This module provides:

* ``StepTimer`` — wall-clock timing with device synchronization, used by
  the trainer and bench.py for the examples/sec/chip north-star metric;
* ``trace`` — context manager around ``jax.profiler`` for on-demand
  TensorBoard traces (``GCN_TPU_TRACE_DIR`` env var enables it).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import List, Optional

import jax


class StepTimer:
    """Accumulates per-step durations; syncs the device on stop."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.durations) / max(1, len(self.durations))

    def best(self, k: int = 3) -> float:
        """Mean of the k fastest steps (steady-state estimate)."""
        return sum(sorted(self.durations)[:k]) / max(1, min(k, len(self.durations)))


@contextlib.contextmanager
def trace(name: str = "train"):
    """jax.profiler trace if GCN_TPU_TRACE_DIR is set, else no-op."""
    trace_dir = os.environ.get("GCN_TPU_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(os.path.join(trace_dir, name)):
            yield
    else:
        yield
