"""Profiling and tracing hooks.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars only).
This module provides:

* ``StepTimer`` — wall-clock timing that synchronizes by FETCHING a
  value from ``sync_on`` (``jax.block_until_ready`` is a silent no-op on
  the axon TPU tunnel — PERF.md measurement rules / CLAUDE.md — so any
  timer built on it would measure dispatch, not execution);
* ``trace`` — context manager around ``jax.profiler`` for on-demand
  TensorBoard traces (``GCN_TPU_TRACE_DIR`` env var enables it).

The trainer and bench.py time their own scans inline (one dispatch per
epoch, fetch the loss array); StepTimer is for ad-hoc experiments.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import List, Optional

import jax
import numpy as np


class StepTimer:
    """Accumulates per-step durations; syncs on stop by fetching."""

    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            # fetch one leaf to host — the only completion barrier that
            # actually waits on the axon tunnel (block_until_ready no-ops)
            leaves = jax.tree.leaves(sync_on)
            if leaves:
                np.asarray(leaves[0])
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
