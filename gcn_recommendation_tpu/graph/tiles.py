"""Block-sparse tile partition of the normalized adjacency (opt-in).

Round-4 rejected MXU block-sparse propagation because qualifying-tile
coverage of non-hub edges was only 40-47% on the then-current graphs
(PERF.md "Evaluated and rejected: reordering + block-sparse MXU
propagation"), with the explicit caveat "revisit on data with stronger
co-clustering".  The round-5 heavy-tailed generator (exact-Zipf
popularity, lognormal-sigma-1 user degrees — data/synthetic.py) produces
exactly that: measured non-hub coverage at bench scale is 65.4% at
fill>=36 with ROW-ONLY degree sorting (tools/exp_block_density.py), over
the >60% wire-it threshold set in round 4's verdict.

Layout decisions (and why):

* **Rows sorted, columns original.**  Destination rows are ranked by
  residual degree so dense rows pack into [128]-row blocks; source
  columns keep NODE order.  Column-original costs ~3% coverage vs
  sorting both sides (65.4% vs 68.6% measured) but means the kernel's
  E-blocks window the embedding table DIRECTLY — no input permutation
  gather, which at ~0.7 ms per [N, d] pass would have erased the win.
* **Hub rows excluded.**  Hub destinations already aggregate on the MXU
  via the dense-row path (graph/build.py::bucket_by_degree); tiles
  compete only against the ELL gather floor (~2.4 ns/padded row).
* **Output is compact.**  Only row blocks containing a qualifying tile
  materialize in the kernel output ([R*128, d]); a per-node index with a
  trailing zeros row merges it into node space in the same fused
  add as the ELL restore gather.
* **Symmetry lives at the matrix level, not the partition level.**  The
  tile subset is NOT symmetric (row sorting is one-sided), but
  tiles + residual ELL + hub rows still sum to the symmetric A_norm, so
  the backward pass reapplies the SAME partitioned matvec to the
  cotangent (ops/block_spmm.py) — the scatter-free custom-VJP trick of
  ops/spmm.py carries over unchanged.

The reference's equivalent op is ``torch.sparse.mm(adj, emb)``
(models/lightgcn.py:44-46); this partition is a TPU-native replacement
strategy for part of that matrix, gated off by default
(Config.tile_spmm).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from gcn_recommendation_tpu.graph.build import (
    EllBucket,
    Graph,
    bucket_by_degree,
)

TILE = 128


@dataclasses.dataclass
class TilePartition:
    """Host-side tile view + residual ELL rebuild of a Graph.

    ``tile_a`` is grouped by output row block and zero-padded so every
    group is a multiple of ``tiles_per_step`` (the kernel batches that
    many tile matmuls per grid step; zero tiles are harmless adds).
    ``tile_col[t]`` indexes 128-column blocks of the NODE-padded
    embedding table; ``step_row[s]`` is the compact output row block
    written by grid step s (non-decreasing).  ``tile_gather_idx[v]`` is
    node v's row in the compact kernel output, or R*128 (a trailing
    zeros row) when v's row holds no tile — the node-space merge is then
    ``out[v] = ell_part[v] + tile_out_ext[tile_gather_idx[v]]``.
    """

    tile_a: np.ndarray          # [T, 128, 128] f32
    tile_col: np.ndarray        # [T] int32 — source column block ids
    step_row: np.ndarray        # [T // tiles_per_step] int32, sorted
    row_block_nodes: np.ndarray  # [R, 128] int32 node ids (-1 pad rows)
    tile_gather_idx: np.ndarray  # [num_nodes] int32 into [R*128 + 1]
    tiles_per_step: int
    n_row_blocks: int
    covered_edges: int
    residual: Graph             # same Graph type, tile edges removed

    @property
    def num_tiles(self) -> int:
        return int(self.tile_a.shape[0])


def partition_tiles(
    g: Graph,
    min_fill: int = 64,
    tiles_per_step: int = 8,
    max_tile_bytes: int = 1 << 30,
) -> Optional[TilePartition]:
    """Split ``g``'s edges into (qualifying tiles, residual ELL graph).

    ``min_fill`` is the break-even edge count per 128x128 tile: the
    measured kernel rate is ~200-230 ns/tile f32 (PERF.md, pallas
    formulation), the ELL gather floor ~2.4 ns/padded row, so fill ~90+
    is where a tile strictly wins; 64 trades a little per-tile margin
    for coverage.  Returns None when no tile qualifies (caller should
    fall back to the plain ELL build).
    """
    num_nodes = g.num_nodes
    nnz = g.nnz
    dst = g.dst[:nnz].astype(np.int64)
    src = g.src[:nnz].astype(np.int64)
    w = g.weight[:nnz]

    # hub rows are already on the MXU dense path — exclude them here so
    # tiles compete only against gather-path edges
    hub = np.zeros(num_nodes, dtype=bool)
    hub[g.dense_node_ids] = True
    cand = ~hub[dst]

    # rank non-hub rows by degree (dense rows first) — the row-side
    # sort that makes tiles dense; columns stay in node order
    deg = np.bincount(dst[cand], minlength=num_nodes)
    rank = np.full(num_nodes, -1, np.int64)
    nonhub_nodes = np.flatnonzero(~hub)
    order = nonhub_nodes[np.argsort(-deg[nonhub_nodes], kind="stable")]
    rank[order] = np.arange(len(order))

    rblk = rank[dst[cand]] // TILE
    cblk = src[cand] // TILE
    n_cblk = -(-num_nodes // TILE)
    key = rblk * n_cblk + cblk
    counts = np.bincount(key)
    qual = np.flatnonzero(counts >= min_fill)
    if len(qual) == 0:
        return None
    # cap tile memory (f32): drop the thinnest tiles first
    max_tiles = max_tile_bytes // (TILE * TILE * 4)
    if len(qual) > max_tiles:
        qual = qual[np.argsort(-counts[qual], kind="stable")[:max_tiles]]
    qual_set = np.zeros(len(counts), dtype=bool)
    qual_set[qual] = True

    in_tile_cand = qual_set[key]
    # scatter back to full-edge mask
    in_tile = np.zeros(nnz, dtype=bool)
    cand_pos = np.flatnonzero(cand)
    in_tile[cand_pos[in_tile_cand]] = True

    # compact row blocks: only blocks that own >= 1 qualifying tile
    used_rblk = np.unique(qual // n_cblk)
    n_row_blocks = len(used_rblk)
    rblk_compact = np.full(int(rblk.max()) + 1 if len(rblk) else 1, -1,
                           np.int64)
    rblk_compact[used_rblk] = np.arange(n_row_blocks)

    # node ids per compact output row (for tests / debugging) and the
    # node-space merge index
    row_block_nodes = np.full((n_row_blocks, TILE), -1, np.int64)
    tile_gather_idx = np.full(num_nodes, n_row_blocks * TILE, np.int64)
    in_used = np.isin(rank[order] // TILE, used_rblk)
    nodes_in_used = order[in_used]
    pos = rblk_compact[rank[nodes_in_used] // TILE] * TILE + (
        rank[nodes_in_used] % TILE
    )
    tile_gather_idx[nodes_in_used] = pos
    row_block_nodes[pos // TILE, pos % TILE] = nodes_in_used

    # build dense tiles grouped by compact row block, padded to
    # tiles_per_step per group
    te_dst = dst[in_tile]
    te_src = src[in_tile]
    te_w = w[in_tile]
    te_r = rblk_compact[rank[te_dst] // TILE]
    te_c = te_src // TILE
    tkey = te_r * n_cblk + te_c
    torder = np.argsort(tkey, kind="stable")
    tkey_s = tkey[torder]
    uniq_key, tile_of_edge = np.unique(tkey_s, return_inverse=True)

    groups: List[Tuple[int, int]] = []  # (row_block, n_tiles) per block
    rb_of_tile = (uniq_key // n_cblk).astype(np.int64)
    cb_of_tile = (uniq_key % n_cblk).astype(np.int64)
    tb = tiles_per_step
    tiles_per_rb = np.bincount(rb_of_tile, minlength=n_row_blocks)
    padded_per_rb = -(-tiles_per_rb // tb) * tb
    T = int(padded_per_rb.sum())
    tile_a = np.zeros((T, TILE, TILE), np.float32)
    tile_col = np.zeros(T, np.int64)
    # slot of each real tile in the padded layout
    rb_start = np.zeros(n_row_blocks + 1, np.int64)
    np.cumsum(padded_per_rb, out=rb_start[1:])
    slot_in_rb = np.concatenate(
        [np.arange(n) for n in tiles_per_rb]
    ) if len(tiles_per_rb) else np.zeros(0, np.int64)
    tile_slot = rb_start[rb_of_tile] + slot_in_rb
    tile_col[tile_slot] = cb_of_tile
    # fill tile values
    e_slot = tile_slot[tile_of_edge]
    e_r = (rank[te_dst[torder]] % TILE).astype(np.int64)
    e_c = (te_src[torder] % TILE).astype(np.int64)
    tile_a[e_slot, e_r, e_c] = te_w[torder]

    step_row = np.repeat(np.arange(n_row_blocks), padded_per_rb // tb)

    # residual graph: every edge not in a tile, re-bucketed (hub rows
    # keep all their edges, so the dense path re-emerges identically)
    keep = ~in_tile
    r_dst = g.dst[:nnz][keep]
    r_src = g.src[:nnz][keep]
    r_w = w[keep]
    buckets, gather_idx, dense_ids, dense_mat = bucket_by_degree(
        r_dst, r_src, r_w, num_nodes
    )
    pad = g.nnz_padded - len(r_dst)
    residual = Graph(
        num_users=g.num_users,
        num_items=g.num_items,
        num_brands=g.num_brands,
        nnz=len(r_dst),
        src=np.concatenate([r_src, np.zeros(pad, g.src.dtype)]),
        dst=np.concatenate([r_dst, np.zeros(pad, g.dst.dtype)]),
        weight=np.concatenate([r_w, np.zeros(pad, np.float32)]),
        row_ptr=_row_ptr(r_dst, num_nodes),
        buckets=buckets,
        gather_idx=gather_idx,
        dense_node_ids=dense_ids,
        dense_mat=dense_mat,
    )
    return TilePartition(
        tile_a=tile_a,
        tile_col=tile_col.astype(np.int32),
        step_row=step_row.astype(np.int32),
        row_block_nodes=row_block_nodes.astype(np.int32),
        tile_gather_idx=tile_gather_idx.astype(np.int32),
        tiles_per_step=tb,
        n_row_blocks=n_row_blocks,
        covered_edges=int(in_tile.sum()),
        residual=residual,
    )


def _row_ptr(dst_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    deg = np.bincount(dst_sorted, minlength=num_nodes)
    rp = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=rp[1:])
    return rp
