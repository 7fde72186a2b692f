"""Multi-host initialization and device topology helpers.

The reference is single-process/single-GPU (SURVEY.md §2.2).  On TPU
pods, multi-host SPMD needs one ``jax.distributed.initialize`` call per
host before any backend use; this module wraps that plus the standard
mesh construction for N hosts x M local chips, so the trainer code is
identical from 1 chip to a pod slice:

* ``initialize()`` — no-op on a single host (or when the coordinator env
  is absent), ``jax.distributed.initialize`` otherwise.  TPU pod
  environments normally need no arguments (the runtime provides the
  coordinator); explicit coordinator/process settings are accepted for
  CPU/GPU-style clusters.
* ``auto_mesh_spec()`` — picks a ('data', 'model') split: the model axis
  spans local chips (fast ICI for the all-gathers in sharded
  propagation/top-k), the data axis spans hosts (DCN only carries the
  gradient psum).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from gcn_recommendation_tpu.core.mesh import MeshSpec

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if distributed mode is active.  Safe to call multiple
    times and on a single host (no-op there).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    explicit = coordinator_address is not None
    env_driven = any(
        v in os.environ
        for v in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "TPU_WORKER_ID")
    )
    if explicit or env_driven:
        kwargs = {}
        if explicit:
            kwargs = dict(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return jax.process_count() > 1


def auto_mesh_spec(model_parallel: Optional[int] = None) -> MeshSpec:
    """('data', 'model') split: model axis = local chips (ICI), data axis =
    the rest (hosts over DCN)."""
    n = len(jax.devices())
    if model_parallel is None:
        model_parallel = max(1, jax.local_device_count())
    model_parallel = min(model_parallel, n)
    while n % model_parallel:
        model_parallel -= 1
    return MeshSpec(data=n // model_parallel, model=model_parallel)
