"""Pallas block-sparse SpMM tiles fused with the ELL gather path.

The kernel is the batched variant measured in tools/exp_block_pallas.py
(199-232 ns/tile f32 at 8-16 tiles/step vs 479 ns at 1 tile/step): each
grid step DMAs one [TB, 128, 128] slab of tile values plus TB
[128, d] embedding windows (the same table passed TB times with
per-slot scalar-prefetched index maps) and accumulates TB MXU matmuls
into a [128, d] VMEM output block, flushed when the destination row
block changes.  Columns index the NODE-ORDER embedding directly (the
row-only-sort layout of graph/tiles.py), so there is no input
permutation gather.

``propagate_ell_tiles`` is the full partitioned matvec
``A_norm @ emb = ELL(residual) + hub rows + tiles``, with the same
symmetric custom VJP as ops/spmm.py::propagate_ell: the partition is
not symmetric but its SUM is, so the backward pass reapplies the
identical forward to the cotangent — training stays scatter-free.

Replaces (part of) the reference's ``torch.sparse.mm(adj, emb)``
(models/lightgcn.py:44-46).  Off by default; enable with
Config.tile_spmm.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.ops.spmm import DeviceGraph, _ell_matvec

TILE = 128


class TileDeviceArrays(NamedTuple):
    """Device-resident tile partition (pytree of jnp arrays).

    Static shape facts the kernel needs (T, TB, R) are all derivable
    from array SHAPES under jit: TB = tile_a.shape[0] // step_row.shape[0],
    R*128 + 1 = implied by tile_gather_idx's max — carried explicitly by
    ``row_block_nodes``'s first dimension instead, which is shipped for
    debugging anyway.
    """

    tile_a: jax.Array           # [T, 128, 128] f32 or bf16
    tile_col: jax.Array         # [T] int32
    step_row: jax.Array         # [T // TB] int32
    tile_gather_idx: jax.Array  # [num_nodes] int32 into [R*128 + 1]
    row_block_nodes: jax.Array  # [R, 128] int32 (static R carrier)


def to_device_tiles(part, tile_dtype=jnp.float32) -> TileDeviceArrays:
    """Ship a graph/tiles.py TilePartition to the device.

    ``tile_dtype=jnp.bfloat16`` halves the dominant HBM stream (the tile
    values) at the same ~0.4%-rounding trade the hub-dense bf16 mode
    takes (PERF.md)."""
    return TileDeviceArrays(
        tile_a=jnp.asarray(part.tile_a, dtype=tile_dtype),
        tile_col=jnp.asarray(part.tile_col),
        step_row=jnp.asarray(part.step_row),
        tile_gather_idx=jnp.asarray(part.tile_gather_idx),
        row_block_nodes=jnp.asarray(part.row_block_nodes),
    )


@functools.lru_cache(maxsize=None)
def _make_tile_call(T, TB, R, d, n_emb_blocks, dtype_name, interpret):
    """Build (and cache) the pallas_call for a static tile geometry."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = T // TB
    compute_dtype = jnp.dtype(dtype_name)

    def kernel(rows_ref, cols_ref, a_ref, *rest):
        e_refs, out_ref = rest[:-1], rest[-1]
        s = pl.program_id(0)
        prev = rows_ref[jnp.maximum(s - 1, 0)]
        first = jnp.logical_or(s == 0, rows_ref[s] != prev)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        acc = out_ref[:]
        for j in range(TB):
            acc += jnp.dot(
                a_ref[j],
                e_refs[j][:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((TB, TILE, TILE), lambda s, rows, cols: (s, 0, 0)),
        ] + [
            pl.BlockSpec(
                (TILE, d),
                (lambda j: lambda s, rows, cols: (cols[s * TB + j], 0))(j),
            )
            for j in range(TB)
        ],
        out_specs=pl.BlockSpec((TILE, d), lambda s, rows, cols: (rows[s], 0)),
    )

    def run(step_row, tile_col, tile_a, emb_padded):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R * TILE, d), jnp.float32),
            interpret=interpret,
        )(step_row, tile_col, tile_a, *([emb_padded] * TB))

    return run


def tile_matvec(emb: jax.Array, tiles: TileDeviceArrays) -> jax.Array:
    """Compact tile output [R*128, d] for node-order ``emb`` [N, d].

    Pads the embedding to a 128-row multiple on the fly (XLA fuses the
    pad into the window reads).  Uses the Pallas interpreter off-TPU so
    the same code path is testable on the CPU meshes the test suite
    runs on (tests force the cpu platform, CLAUDE.md)."""
    T = tiles.tile_a.shape[0]
    TB = T // tiles.step_row.shape[0]
    R = tiles.row_block_nodes.shape[0]
    n, d = emb.shape
    n_blocks = -(-n // TILE)
    pad = n_blocks * TILE - n
    emb_padded = jnp.pad(emb, ((0, pad), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    run = _make_tile_call(
        int(T), int(TB), int(R), int(d), int(n_blocks),
        str(tiles.tile_a.dtype), interpret,
    )
    return run(tiles.step_row, tiles.tile_col, tiles.tile_a, emb_padded)


def _ell_tiles_matvec(emb, graph: DeviceGraph, tiles: TileDeviceArrays):
    base = _ell_matvec(
        emb,
        graph.bucket_nbr_idx,
        graph.bucket_nbr_w,
        graph.gather_idx,
        graph.dense_mat,
    )
    tile_out = tile_matvec(emb, tiles)
    # trailing zeros row for nodes with no tile coverage; the gather+add
    # fuses like the ELL restore gather
    ext = jnp.concatenate(
        [tile_out, jnp.zeros((1, emb.shape[1]), tile_out.dtype)]
    )
    return base + ext[tiles.tile_gather_idx].astype(emb.dtype)


@jax.custom_vjp
def propagate_ell_tiles(emb, graph: DeviceGraph, tiles: TileDeviceArrays):
    """``A_norm @ emb`` over the tile partition (residual ELL + hub rows
    + Pallas tiles)."""
    return _ell_tiles_matvec(emb, graph, tiles)


def _fwd(emb, graph, tiles):
    return _ell_tiles_matvec(emb, graph, tiles), (graph, tiles)


def _bwd(res, g):
    graph, tiles = res
    # total matrix is symmetric (graph/tiles.py module docstring), so
    # d(emb) = A_norm @ g via the same partitioned kernel
    return _ell_tiles_matvec(g, graph, tiles), None, None


propagate_ell_tiles.defvjp(_fwd, _bwd)


class TiledDeviceGraph(NamedTuple):
    """Device graph for the tile partition: residual ELL+hub DeviceGraph
    plus the Pallas tile arrays.  Not a DeviceGraph instance, so the
    model's merge-skip fused path auto-disables (tiles produce
    node-order output each layer; the fused kernel lives in permuted
    parts space) and the per-layer ``propagate`` dispatch picks
    ``propagate_ell_tiles``."""

    base: DeviceGraph
    tiles: TileDeviceArrays
