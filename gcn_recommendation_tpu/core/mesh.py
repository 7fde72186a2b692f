"""Device mesh and sharding layout.

The reference is strictly single-GPU (main.py:38,59 pins one CUDA device and
imports no collective backend).  Here parallelism is first-class: a 2-D
``('data', 'model')`` mesh where

* the ``data`` axis shards BPR interaction batches (data parallelism),
* the ``model`` axis row-shards the embedding tables and the destination
  rows of the normalized adjacency (tensor parallelism for a model whose
  parameters *are* the tables).

Collectives are left to XLA: propagation all-gathers source-node embeddings
over ``model``; gradients psum over ``data``; top-k merges across item
shards.  See parallel/ for the shard_map formulation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * model`` must divide the device count."""

    data: int = 1
    model: int = 1

    @property
    def shape(self):
        return (self.data, self.model)


def create_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh.

    With ``spec=None`` all available devices go on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    n = spec.data * spec.model
    if n > len(devices):
        raise ValueError(
            f"mesh {spec.shape} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(spec.shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh, axis: str = MODEL_AXIS) -> NamedSharding:
    """Shard the leading (row) dimension of a table over ``axis``."""
    return NamedSharding(mesh, P(axis))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def local_mesh_for_testing(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D data mesh over however many (virtual) devices exist
    (or exactly ``n_devices`` when given).

    Tests run under XLA_FLAGS=--xla_force_host_platform_device_count=8 on
    CPU (see tests/conftest.py), matching SURVEY.md §4's multi-host
    simulation strategy.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    return create_mesh(MeshSpec(data=n_devices, model=1))


def pad_to_multiple(n: int, m: int) -> int:
    """Round ``n`` up to a multiple of ``m`` (for even sharding / tiling)."""
    return ((n + m - 1) // m) * m
