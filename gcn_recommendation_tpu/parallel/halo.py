"""Explicit sharded propagation: row-partitioned nodes + halo exchange.

This is the graph analogue of sequence parallelism (SURVEY.md §5
"long-context"): the reference holds every embedding and the whole
adjacency on one device (main.py:336); here node rows are partitioned
contiguously across the ``model`` axis and each propagation layer

1. **all-gathers** the source-node embeddings over the model axis (the
   halo exchange — the direct analogue of ring-attention's KV rotation;
   XLA lowers it to an ICI ring all-gather),
2. runs the **local scatter-free ELL/dense kernel** over the shard's
   destination rows only.

Autodiff through ``shard_map`` transposes the all-gather into a
reduce-scatter, so the backward pass has the same communication volume.

Unlike the GSPMD formulation in spmd.py (where the compiler chooses the
collectives), this module fixes the schedule explicitly, which is what
you want on a real pod: one all-gather of [N, d] per layer over ICI,
nothing over DCN.

Host-side, ``shard_ell`` re-buckets the graph per shard with a common
bucket-width set and per-width row counts padded to the max across
shards, so every shard runs the same program (SPMD requires identical
shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gcn_recommendation_tpu.core.mesh import MODEL_AXIS
from gcn_recommendation_tpu.graph.build import Graph, bucket_by_degree
from gcn_recommendation_tpu.train.trainer import Trainer


class ShardedEllArrays(NamedTuple):
    """Device arrays of the per-shard ELL adjacency (a jit-able pytree)."""

    bucket_nbr_idx: Tuple[jax.Array, ...]  # per width [m, rows, w] int32
    bucket_nbr_w: Tuple[jax.Array, ...]    # per width [m, rows, w] f32
    gather_idx: jax.Array                  # [m, nodes_per_shard] int32
    dense_mat: jax.Array                   # [m, h_max, num_nodes_pad] f32


class ShardedEll:
    """Per-shard ELL adjacency: static metadata + array pytree.

    Arrays live in ``.arrays`` so they can be passed through jit as
    arguments (never closure constants — see PERF.md)."""

    def __init__(self, arrays: ShardedEllArrays, n_shards, nodes_per_shard, num_nodes):
        self.arrays = arrays
        self.n_shards = n_shards
        self.nodes_per_shard = nodes_per_shard
        self.num_nodes = num_nodes            # true (unpadded) node count

    @property
    def num_nodes_pad(self):
        return self.n_shards * self.nodes_per_shard


def shard_ell(graph: Graph, n_shards: int, dense_threshold: int = 128) -> ShardedEll:
    """Partition destination rows contiguously into ``n_shards`` shards.

    Each shard gets its own degree-bucketed ELL (+ dense hub rows) over a
    shared width set; row counts are zero-padded to the per-width max so
    all shards are shape-identical.
    """
    n = graph.num_nodes
    nps = -(-n // n_shards)
    n_pad = nps * n_shards

    dst = graph.dst[: graph.nnz].astype(np.int64)
    src = graph.src[: graph.nnz].astype(np.int64)
    w = graph.weight[: graph.nnz]

    per_shard = []
    for s in range(n_shards):
        lo, hi = s * nps, min((s + 1) * nps, n)
        m = (dst >= lo) & (dst < hi)
        # local dst ids, global src ids
        buckets, gidx, hub_ids, dense = bucket_by_degree(
            dst[m] - lo,
            src[m],
            w[m],
            nps,
            dense_threshold=dense_threshold,
            num_src_nodes=n_pad,
        )
        per_shard.append((buckets, gidx, hub_ids, dense))

    # union of widths across shards
    widths = sorted({b.width for bks, *_ in per_shard for b in bks})
    rows_max = {
        wd: max(
            next((b.nbr_idx.shape[0] for b in bks if b.width == wd), 0)
            for bks, *_ in per_shard
        )
        for wd in widths
    }
    h_max = max(d.shape[0] for *_, d in per_shard)

    stacked_idx, stacked_w = [], []
    for wd in widths:
        si = np.zeros((n_shards, rows_max[wd], wd), np.int32)
        sw = np.zeros((n_shards, rows_max[wd], wd), np.float32)
        for s, (bks, *_rest) in enumerate(per_shard):
            for b in bks:
                if b.width == wd:
                    si[s, : b.nbr_idx.shape[0]] = b.nbr_idx
                    sw[s, : b.nbr_w.shape[0]] = b.nbr_w
        stacked_idx.append(jnp.asarray(si))
        stacked_w.append(jnp.asarray(sw))

    # per-shard gather_idx must address the *padded* concat layout:
    # [width-0 rows_max | width-1 rows_max | ... | h_max dense | 1 zeros].
    # Rebuild it from each shard's own (unpadded) layout.
    gather = np.zeros((n_shards, nps), np.int32)
    dense_stack = np.zeros((n_shards, h_max, n_pad), np.float32)
    width_offset = {}
    off = 0
    for wd in widths:
        width_offset[wd] = off
        off += rows_max[wd]
    dense_offset = off
    zeros_row = off + h_max

    for s, (bks, _gidx, hub_ids, dense) in enumerate(per_shard):
        local = np.full(nps, zeros_row, np.int32)
        for b in bks:
            local[b.node_ids] = width_offset[b.width] + np.arange(
                b.node_ids.shape[0], dtype=np.int32
            )
        if hub_ids.shape[0]:
            local[hub_ids] = dense_offset + np.arange(hub_ids.shape[0], dtype=np.int32)
            dense_stack[s, : dense.shape[0], : dense.shape[1]] = dense
        gather[s] = local

    return ShardedEll(
        ShardedEllArrays(
            bucket_nbr_idx=tuple(stacked_idx),
            bucket_nbr_w=tuple(stacked_w),
            gather_idx=jnp.asarray(gather),
            dense_mat=jnp.asarray(dense_stack),
        ),
        n_shards=n_shards,
        nodes_per_shard=nps,
        num_nodes=n,
    )


def _local_propagate(full_emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat):
    """One shard's output rows from the gathered full embedding block."""
    from gcn_recommendation_tpu.ops.spmm import _bucket_reduce

    parts = []
    for idx, wt in zip(bucket_nbr_idx, bucket_nbr_w):
        parts.append(_bucket_reduce(full_emb, idx, wt).astype(full_emb.dtype))
    if dense_mat.shape[0]:
        parts.append(
            jnp.dot(dense_mat, full_emb, preferred_element_type=jnp.float32).astype(
                full_emb.dtype
            )
        )
    parts.append(jnp.zeros((1, full_emb.shape[1]), full_emb.dtype))
    return jnp.concatenate(parts, axis=0)[gather_idx]


def make_halo_propagator(mesh: Mesh, sharded: ShardedEll, n_layers: int):
    """Build ``fn(emb_pad [N_pad, d]) -> final [N_pad, d]``.

    Computes the LightGCN layer mean ``mean(e0, A e0, ..., A^K e0)`` with
    the explicit all-gather-per-layer schedule.  Input and output are the
    full padded node block (replicated in/out for composability; the
    internal compute is sharded).
    """

    assert sharded.n_shards == mesh.shape[MODEL_AXIS], (
        f"graph sharded {sharded.n_shards}-way but model axis is "
        f"{mesh.shape[MODEL_AXIS]}"
    )

    n_widths = len(sharded.arrays.bucket_nbr_idx)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS),  # emb rows sharded
            (P(MODEL_AXIS, None, None),) * n_widths,
            (P(MODEL_AXIS, None, None),) * n_widths,
            P(MODEL_AXIS, None),
            P(MODEL_AXIS, None, None),
        ),
        out_specs=P(MODEL_AXIS),
    )
    def run(emb_local, b_idx, b_w, gidx, dmat):
        # leading shard axis is size 1 inside the map
        b_idx = tuple(x[0] for x in b_idx)
        b_w = tuple(x[0] for x in b_w)
        gidx = gidx[0]
        dmat = dmat[0]
        acc = emb_local
        e = emb_local
        for _ in range(n_layers):
            full = jax.lax.all_gather(e, MODEL_AXIS, tiled=True)  # halo exchange
            e = _local_propagate(full, b_idx, b_w, gidx, dmat)
            acc = acc + e
        return acc / (n_layers + 1)

    def propagate(emb_pad, arrays: ShardedEllArrays = None):
        a = arrays if arrays is not None else sharded.arrays
        return run(
            emb_pad,
            a.bucket_nbr_idx,
            a.bucket_nbr_w,
            a.gather_idx,
            a.dense_mat,
        )

    return propagate


def make_halo_table_propagator(mesh: Mesh, sharded: ShardedEll, n_layers: int):
    """Build ``fn(u, i, b) -> final [N_pad, d]`` over ROW-SHARDED tables.

    The round-2 schedule took the concatenated node block replicated
    (``make_halo_propagator``), which forced the params and Adam state to
    be replicated per chip (round-2 VERDICT "What's weak" #2: ~6.6 GB per
    chip at the dim-256 north star).  Here the three embedding tables
    enter the shard_map row-sharded — per-chip param+optimizer memory is
    1/m — and the layer-0 halo exchange is three per-table all-gathers
    that reassemble the full node block *in node order*, so no
    table-layout→node-layout relayout collective exists anywhere.  Total
    all-gather volume per layer is unchanged ([N_pad, d] once per layer);
    autodiff transposes the per-table all-gathers into per-table
    reduce-scatters, delivering gradients already sharded like the params.

    Requires every table row count to divide the model axis
    (model.set_row_multiple — HaloTrainer arranges this) so that the
    per-shard node count equals the sum of per-shard table slices.
    """
    m = mesh.shape[MODEL_AXIS]
    assert sharded.n_shards == m
    nps = sharded.nodes_per_shard
    n_widths = len(sharded.arrays.bucket_nbr_idx)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS),  # user table rows sharded
            P(MODEL_AXIS),  # item table rows sharded
            P(MODEL_AXIS),  # brand table rows sharded
            (P(MODEL_AXIS, None, None),) * n_widths,
            (P(MODEL_AXIS, None, None),) * n_widths,
            P(MODEL_AXIS, None),
            P(MODEL_AXIS, None, None),
        ),
        out_specs=P(MODEL_AXIS),
    )
    def run(u_local, i_local, b_local, b_idx, b_w, gidx, dmat):
        b_idx = tuple(x[0] for x in b_idx)
        b_w = tuple(x[0] for x in b_w)
        gidx = gidx[0]
        dmat = dmat[0]
        # layer-0 halo exchange: reassemble the global node block from the
        # per-table shards — concatenating the three tiled all-gathers
        # yields exactly [users_pad | items_pad | brands_pad] node order
        full = jnp.concatenate(
            [
                jax.lax.all_gather(u_local, MODEL_AXIS, tiled=True),
                jax.lax.all_gather(i_local, MODEL_AXIS, tiled=True),
                jax.lax.all_gather(b_local, MODEL_AXIS, tiled=True),
            ],
            axis=0,
        )
        s = jax.lax.axis_index(MODEL_AXIS)
        # this shard's own e0 rows in the contiguous node partition
        e = jax.lax.dynamic_slice_in_dim(full, s * nps, nps)
        acc = e
        for layer in range(n_layers):
            if layer:  # layer 0 reuses the table-gather block above
                full = jax.lax.all_gather(e, MODEL_AXIS, tiled=True)
            e = _local_propagate(full, b_idx, b_w, gidx, dmat)
            acc = acc + e
        return acc / (n_layers + 1)

    def propagate(u, i, b, arrays: ShardedEllArrays = None):
        a = arrays if arrays is not None else sharded.arrays
        return run(
            u, i, b,
            a.bucket_nbr_idx,
            a.bucket_nbr_w,
            a.gather_idx,
            a.dense_mat,
        )

    return propagate


class _CooView(NamedTuple):
    """Lightweight COO graph view shard_ell can consume (it re-buckets per
    shard itself, so remapping into the TP-padded node space never needs
    the full Graph rebuild that graph.build.pad_graph_nodes does)."""

    src: np.ndarray
    dst: np.ndarray
    weight: np.ndarray
    nnz: int
    num_nodes: int


def pad_coo_node_space(graph: Graph, num_users_pad, num_items_pad, num_brands_pad):
    """Remap COO node ids into the ``[users_pad | items_pad | brands_pad]``
    layout (same monotone remap as graph.build.pad_graph_nodes, COO only)."""
    U, I = graph.num_users, graph.num_items
    du = np.int64(num_users_pad - U)
    di = np.int64(num_items_pad - I)

    def remap(v):
        v = v.astype(np.int64)
        return (v + du * (v >= U) + di * (v >= U + I)).astype(np.int32)

    return _CooView(
        src=remap(graph.src[: graph.nnz]),
        dst=remap(graph.dst[: graph.nnz]),
        weight=graph.weight[: graph.nnz],
        nnz=graph.nnz,
        num_nodes=num_users_pad + num_items_pad + num_brands_pad,
    )


class HaloTrainer(Trainer):
    """Trainer whose forward pass runs the explicit halo-exchange schedule.

    Subclasses train.trainer.Trainer, overriding only how the device
    adjacency is laid out (per-shard ELL via ``shard_ell``), how the model
    forward runs (``make_halo_table_propagator``), and how state is placed
    (row-sharded tables + Adam state over the model axis, so per-chip
    param+optimizer memory is 1/m — round-2 VERDICT "What's weak" #2) —
    the loss (including the optional brand term), negative sampler, epoch
    scan, optimizer, checkpointing and validation are all inherited, so
    the paths cannot diverge.  Tested against the single-device trainer on
    the virtual CPU mesh (tests/test_halo.py).
    """

    graph_chunking = False  # shard_ell expects the plain ELL layout

    def __init__(self, config, model, bundle, mesh: Mesh, logger=None):
        self.mesh = mesh
        n_model = mesh.shape[MODEL_AXIS]
        if n_model > 1:
            # pad the tables to a model-axis multiple so they row-shard
            # evenly AND the per-shard node count equals the sum of the
            # per-shard table slices (the table propagator's contract).
            # Copy: the caller's model may be shared with an unpadded
            # single-device trainer.
            import copy

            padded = model.needs_row_padding(n_model)
            model = copy.copy(model)
            model.set_row_multiple(n_model)
            if padded:
                print(
                    f"TP padding (halo): tables -> multiples of {n_model} "
                    f"(users {model.num_users}->{model.num_users_pad}, "
                    f"items {model.num_items}->{model.num_items_pad}, "
                    f"brands {model.num_brands}->{model.num_brands_pad})"
                )
            graph = pad_coo_node_space(
                bundle.graph,
                model.num_users_pad,
                model.num_items_pad,
                model.num_brands_pad,
            )
        else:
            graph = bundle.graph
        self.sharded = shard_ell(graph, n_model)
        self.propagator = make_halo_table_propagator(
            mesh, self.sharded, model.n_layers
        )
        super().__init__(config, model, bundle, logger=logger)

    def _device_graph(self, cdtype):
        return self.sharded.arrays

    def init_state(self, key):
        params, opt_state = super().init_state(key)
        return self._place_state(params, opt_state)

    def _place_state(self, params, opt_state):
        # row-shard the tables (and the mirrored Adam mu/nu trees) over the
        # model axis; also re-shards state restored from --resume
        from gcn_recommendation_tpu.parallel.spmd import shard_params

        return (
            shard_params(params, self.mesh),
            shard_params(opt_state, self.mesh),
        )

    def _batch_loss(self, params, arrays, users, pos, neg):
        # pin the batch to the data axis (same DP contract as the GSPMD
        # ShardedTrainer); grads psum falls out of the loss mean
        from jax.sharding import NamedSharding

        from gcn_recommendation_tpu.core.mesh import DATA_AXIS

        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        users = jax.lax.with_sharding_constraint(users, sh)
        pos = jax.lax.with_sharding_constraint(pos, sh)
        neg = jax.lax.with_sharding_constraint(neg, sh)
        return super()._batch_loss(params, arrays, users, pos, neg)

    def _forward(self, params, arrays):
        return self.model.apply_with_table_propagator(
            params,
            lambda u, i, b: self.propagator(u, i, b, arrays.graph),
        )

    def _forward_eval(self, params):
        return self._forward(params, self.arrays)

    def validate(self, params):
        # items-row-sharded distributed top-k over the same model axis the
        # halo schedule trains on — round-1 VERDICT.md #3: the inherited
        # single-device validate replicated the full user x catalog top-k
        # on every chip (reference eval semantics: main.py:404-439)
        from gcn_recommendation_tpu.parallel.spmd import (
            validate_with_sharded_topk,
        )

        return validate_with_sharded_topk(self, params)
