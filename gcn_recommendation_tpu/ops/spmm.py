"""Sparse propagation (SpMM) — the hottest kernel.

The reference's hottest op is ``torch.sparse.mm(adj, emb)`` run K times per
training batch (models/lightgcn.py:44-46, called from main.py:495).  TPUs
have no native sparse matmul and XLA scatter-adds serialize badly, so the
TPU-native formulation avoids scatters entirely:

* **ELL path (default)**: the graph is stored as degree-bucketed padded
  neighbor lists (graph/build.py).  Propagation per bucket is
  ``gather -> multiply -> reduce`` over the padded neighbor axis, then one
  inverse-permutation gather restores node order.  Pure gathers + VPU
  reductions; XLA fuses the multiply/reduce into the gather consumer.
* **COO path (reference/fallback)**: dst-sorted edge list with
  ``jax.ops.segment_sum`` — used for cross-checking and tiny graphs.

Both compute exactly ``A_norm @ emb`` for the symmetric normalized
adjacency.  Gradients flow through gathers (transpose = scatter-add handled
by XLA only in the backward pass, where it is unavoidable — the forward hot
path stays scatter-free; the ELL backward transposes to a gather over the
same structure because A is symmetric, see ``_propagate_ell_bwd``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.graph.build import Graph


class DeviceGraph(NamedTuple):
    """Device-resident adjacency (a pytree of jnp arrays).

    Static sizes (num_users/items/brands) live on the model, not here, so
    this tuple can flow through jit without retracing on metadata.

    The two trailing ``*_perm`` fields are the *permuted-space* views
    that let multi-layer propagation skip the per-layer merge/restore
    gather (see propagate_sum_ell): neighbor ids composed with
    ``gather_idx`` so layer k >= 2 gathers straight from layer k-1's
    bucket-concat output, plus the hub-row matrix with its columns
    rearranged into that same parts order.  They default empty — paths
    that never fuse (COO fallback, hand-built test graphs) don't pay
    for them.
    """

    src: jax.Array            # [nnz_pad] int32, dst-sorted COO
    dst: jax.Array            # [nnz_pad] int32
    weight: jax.Array         # [nnz_pad] f32
    bucket_nbr_idx: Tuple[jax.Array, ...]  # per bucket [nb, width] int32
    bucket_nbr_w: Tuple[jax.Array, ...]    # per bucket [nb, width] f32
    gather_idx: jax.Array     # [num_nodes] int32 into
                              # concat(buckets, dense rows, zeros row)
    dense_mat: jax.Array      # [H, num_nodes] f32 hub rows (MXU path)
    bucket_nbr_idx_perm: Tuple[jax.Array, ...] = ()  # gather_idx[nbr_idx]
    dense_mat_perm: Optional[jax.Array] = None       # [H, nrows] cols permuted


def to_device_graph(
    g: Graph,
    compute_dtype=jnp.float32,
    dense_dtype=None,
    include_coo: bool = False,
    fuse_layers: bool = True,
) -> DeviceGraph:
    """``dense_dtype`` (default = compute_dtype) controls the hub-row
    matrix precision: bf16 halves its HBM read at ~0.4% weight rounding —
    an opt-in trade (see PERF.md).

    ``include_coo`` additionally ships the sorted-COO view to the device
    (~12 bytes/edge of HBM).  Only the ``path='coo'`` reference/fallback
    propagator needs it; the production ELL path never touches it, so it
    stays on the host by default.

    ``fuse_layers`` builds the permuted-space views (composed neighbor
    ids + column-permuted hub matrix) that let propagate_sum_ell skip
    per-layer merge gathers.  The hub matrix is then resident TWICE
    (node-column + parts-column order) — worth it single-device (2 of 6
    merge gathers survive, PERF.md "merge-skip"), opt out where HBM is
    tighter than step time."""
    if dense_dtype is None:
        dense_dtype = compute_dtype
    empty_i = jnp.zeros((0,), jnp.int32)
    idx_perm = ()
    dense_perm = None
    if fuse_layers:
        # neighbor ids composed into parts order: layer k >= 2 gathers
        # directly from layer k-1's bucket-concat output
        idx_perm = tuple(
            jnp.asarray(g.gather_idx[b.nbr_idx]) for b in g.buckets
        )
        h = g.dense_mat.shape[0]
        nrows = sum(b.nbr_idx.shape[0] for b in g.buckets) + h + 1
        dp = np.zeros((h, nrows), g.dense_mat.dtype)
        # column v of the node-space hub matrix lands at parts position
        # gather_idx[v]; degree-0 nodes share the trailing zeros position
        # but their columns are all-zero (no edges), so the collision is
        # harmless (last-write-wins over zeros)
        dp[:, g.gather_idx] = g.dense_mat
        dense_perm = jnp.asarray(dp, dtype=dense_dtype)
    return DeviceGraph(
        src=jnp.asarray(g.src) if include_coo else empty_i,
        dst=jnp.asarray(g.dst) if include_coo else empty_i,
        weight=jnp.asarray(g.weight, dtype=compute_dtype)
        if include_coo
        else jnp.zeros((0,), compute_dtype),
        bucket_nbr_idx=tuple(jnp.asarray(b.nbr_idx) for b in g.buckets),
        bucket_nbr_w=tuple(
            jnp.asarray(b.nbr_w, dtype=compute_dtype) for b in g.buckets
        ),
        gather_idx=jnp.asarray(g.gather_idx),
        dense_mat=jnp.asarray(g.dense_mat, dtype=dense_dtype),
        bucket_nbr_idx_perm=idx_perm,
        dense_mat_perm=dense_perm,
    )


def propagate_coo(
    emb: jax.Array, src: jax.Array, dst: jax.Array, weight: jax.Array, num_nodes: int
) -> jax.Array:
    """``out[v] = sum_{e: dst[e]=v} w[e] * emb[src[e]]`` via segment_sum.

    Reference implementation (matches torch.sparse.mm at
    models/lightgcn.py:45); kept for parity tests and CPU fallback.
    """
    msgs = emb[src] * weight[:, None]
    return jax.ops.segment_sum(
        msgs, dst, num_segments=num_nodes, indices_are_sorted=True
    )


# Crossover between the fused [nb, w, d] gather+reduce and a sum of w
# column-wise width-1 gathers (measured on v5e, tools/exp_min_width.py):
# below 8 the fused form pays (8, 128) tile padding on the [nb, w(, d)]
# intermediates — colsum runs 4.9x / 3.9x faster at w = 2 / 4 and hits
# 1.67-1.87 ns/gathered-row, *below* the ~2.5 ns fused gather wall; the
# fused form wins again at w >= 8 (3.46 vs 4.23 ns/row).  This is also
# what makes sub-8 bucket widths worthwhile at all (graph/build.py's
# width schedule emits 1/2/4 buckets): with the fused form, a width-4
# bucket costs as much as a width-8 one.
COLSUM_MAX_WIDTH = 4


def _bucket_reduce(emb, idx, w):
    """One ELL bucket's reduction ``sum_j emb[idx[:, j]] * w[:, j]``.

    Returns f32 rows (accumulation stays f32 even in bf16 storage mode:
    the reduction runs up to width-2048, where bf16 loses ~2 decimal
    digits; f32 accumulators are free on the VPU).  Formulation switches
    on the bucket width, see COLSUM_MAX_WIDTH.
    """
    width = idx.shape[1]
    if width <= COLSUM_MAX_WIDTH:
        acc = None
        for j in range(width):
            t = jnp.take(emb, idx[:, j], axis=0) * w[:, j][:, None]
            t = t.astype(jnp.float32)
            acc = t if acc is None else acc + t
        return acc
    gathered = jnp.take(emb, idx, axis=0)              # [nb, width, d]
    return jnp.sum(gathered * w[..., None], axis=1, dtype=jnp.float32)


def _ell_matvec(emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat):
    parts = []
    for idx, w in zip(bucket_nbr_idx, bucket_nbr_w):
        parts.append(_bucket_reduce(emb, idx, w).astype(emb.dtype))
    if dense_mat.shape[0]:
        # hub rows: one dense MXU matmul replaces the power-law gather tail
        parts.append(
            jnp.dot(
                dense_mat,
                emb.astype(dense_mat.dtype),
                preferred_element_type=jnp.float32,
            ).astype(emb.dtype)
        )
    parts.append(jnp.zeros((1, emb.shape[1]), emb.dtype))  # degree-0 row
    return jnp.concatenate(parts, axis=0)[gather_idx]


@jax.custom_vjp
def propagate_ell(emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat):
    """Scatter-free SpMM over the degree-bucketed ELL adjacency
    (+ dense MXU rows for hub nodes)."""
    return _ell_matvec(emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat)


def _propagate_ell_fwd(emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat):
    out = _ell_matvec(emb, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat)
    return out, (bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat)


def _propagate_ell_bwd(res, g):
    # A_norm is symmetric, so d(emb) = A_norm^T @ g = A_norm @ g — the
    # backward pass is the *same* scatter-free gather kernel applied to the
    # cotangent.  This is the key trick that keeps training scatter-free.
    bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat = res
    d_emb = _ell_matvec(g, bucket_nbr_idx, bucket_nbr_w, gather_idx, dense_mat)
    return d_emb, None, None, None, None


propagate_ell.defvjp(_propagate_ell_fwd, _propagate_ell_bwd)


# ---------------------------------------------------------------------------
# Fused multi-layer propagation — merge-skip via permuted space
# ---------------------------------------------------------------------------
#
# Per-layer propagate_ell ends every pass with a [N]-row restore gather
# (``concat(parts)[gather_idx]``) whose only consumer is the next layer's
# bucket gathers.  Composing the restore permutation into those gathers at
# BUILD time (idx_perm = gather_idx[nbr_idx], hub columns rearranged the
# same way) lets layers 2..K read layer k-1's bucket-concat output
# directly: K layers need ONE restore gather instead of K, and — because
# sum_k A^k is symmetric like A itself — the backward pass is the same
# fused kernel applied to the cotangent, so a 3-layer training step runs
# 2 merge gathers instead of 6 (measured 0.73 ms each on v5e; PERF.md
# "step decomposition").


def _parts_matvec(x, bucket_idx, bucket_w, dense):
    """One propagation returning the PARTS-ORDER output [nrows, d]
    (bucket-concat + hub rows + zeros row), without the restore gather.
    ``x`` may be node-order (layer 1, with node-space indices/hub matrix)
    or parts-order (later layers, with composed views)."""
    parts = [
        _bucket_reduce(x, idx, w).astype(x.dtype)
        for idx, w in zip(bucket_idx, bucket_w)
    ]
    if dense.shape[0]:
        parts.append(
            jnp.dot(
                dense,
                x.astype(dense.dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    parts.append(jnp.zeros((1, x.shape[1]), x.dtype))
    return jnp.concatenate(parts, axis=0)


def _sum_matvec(
    n_layers, ego, bucket_idx, bucket_w, idx_perm, gather_idx, dense_mat,
    dense_perm,
):
    p = _parts_matvec(ego, bucket_idx, bucket_w, dense_mat)
    s = p.astype(jnp.float32)
    for _ in range(n_layers - 1):
        p = _parts_matvec(p, idx_perm, bucket_w, dense_perm)
        s = s + p.astype(jnp.float32)
    return s[gather_idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def propagate_sum_ell(
    n_layers, ego, bucket_idx, bucket_w, idx_perm, gather_idx, dense_mat,
    dense_perm,
):
    """``sum_{k=1..K} A_norm^k @ ego`` in f32, scatter-free, with one
    restore gather total (merge-skip).  Callers form the LightGCN layer
    mean as ``(ego + result) / (K + 1)`` (models/lightgcn.py:54
    semantics)."""
    return _sum_matvec(
        n_layers, ego, bucket_idx, bucket_w, idx_perm, gather_idx,
        dense_mat, dense_perm,
    )


def _propagate_sum_fwd(n_layers, ego, bi, bw, ip, gi, dm, dp):
    out = _sum_matvec(n_layers, ego, bi, bw, ip, gi, dm, dp)
    return out, (bi, bw, ip, gi, dm, dp)


def _propagate_sum_bwd(n_layers, res, g):
    # sum_k A^k is symmetric (A is), so d(ego) = the same fused kernel
    # applied to the cotangent — same merge-skip structure backwards.
    # The primal's dtype equals the neighbor-weight dtype by construction
    # (both are the graph's compute dtype); residuals must be arrays, so
    # recover it from there rather than storing a dtype object.
    bi, bw, ip, gi, dm, dp = res
    dtype = bw[0].dtype if len(bw) else dm.dtype
    d_ego = _sum_matvec(n_layers, g.astype(dtype), bi, bw, ip, gi, dm, dp)
    return (d_ego.astype(dtype), None, None, None, None, None, None)


propagate_sum_ell.defvjp(_propagate_sum_fwd, _propagate_sum_bwd)


def propagate(emb: jax.Array, graph, num_nodes: int, *, path: str = "ell"):
    """One propagation step ``A_norm @ emb``.

    ``graph`` is a DeviceGraph or a ChunkedDeviceGraph (large-graph
    source-chunked layout — see the gather knee notes below).
    ``path``: 'ell' (TPU-native, default) or 'coo' (segment_sum fallback).
    """
    from gcn_recommendation_tpu.ops.block_spmm import (
        TiledDeviceGraph,
        propagate_ell_tiles,
    )

    if isinstance(graph, TiledDeviceGraph):
        return propagate_ell_tiles(emb, graph.base, graph.tiles)
    if isinstance(graph, ChunkedDeviceGraph):
        return propagate_chunked(
            emb,
            graph.chunk_bucket_idx,
            graph.chunk_bucket_w,
            graph.chunk_gather_idx,
            graph.dense_mat,
            graph.dense_gather_idx,
        )
    if path == "ell":
        return propagate_ell(
            emb,
            graph.bucket_nbr_idx,
            graph.bucket_nbr_w,
            graph.gather_idx,
            graph.dense_mat,
        )
    elif path == "coo":
        if graph.src.shape[0] == 0:
            raise ValueError(
                "COO view not on device — build with "
                "to_device_graph(..., include_coo=True)"
            )
        return propagate_coo(emb, graph.src, graph.dst, graph.weight, num_nodes)
    raise ValueError(f"unknown propagation path {path!r}")


# ---------------------------------------------------------------------------
# Source-chunked ELL — large-graph path (the "gather knee", PERF.md)
# ---------------------------------------------------------------------------

# Measured on v5e (PERF.md "gather knee"): the XLA row-gather rate is
# bimodal, and the knee position collapses onto the source table's
# (sublane, 128-lane) TILE COUNT — not raw rows and not bytes
# (tools/exp_dim_split.py + the bf16 probe):
#
#   f32 d<=128: fast <= 180k rows (= 22.5k tiles), slow at 360k
#   f32 d=256:  fast <=  90k rows (rows span 2 lane-tiles -> 22.5k), slow at 180k
#   bf16 d=64:  fast <= 360k rows (16-row sublane tiles -> 22.5k), slow at 720k
#
# i.e. the fast region ends at ~22.5k tiles of (8 rows f32 / 16 rows
# bf16) x 128 lanes.  Propagation on big graphs therefore gathers from
# sub-tables of at most knee_rows_for(d, dtype) rows of the embedding
# block (chunk-local neighbor ids), ~1.8-2x faster per row.  Earlier
# sweeps that kept 180k-row chunks at d=256 sat ABOVE that dim's knee
# and measured no win (plain 2661.7 ms/step vs 2886.1/2908.3 at 2/4
# chunks); 8 chunks (90k rows) measure 1708.8 ms/step — 1.56x — on the
# same stress-scale dim-256 4-layer config.
GATHER_KNEE_ROWS = 180_000   # f32, d <= 128 (the measured anchor)


def knee_rows_for(embedding_dim: int, compute_dtype=jnp.float32) -> int:
    """Gather-knee row count for this embedding width/storage dtype
    (tile-count model above; d=256 f32 and d=64 bf16 points measured,
    other combinations extrapolated)."""
    lane_tiles_per_row = max(1, -(-int(embedding_dim) // 128))
    sublane = 16 if jnp.dtype(compute_dtype) == jnp.bfloat16 else 8
    return GATHER_KNEE_ROWS * (sublane // 8) // lane_tiles_per_row


def num_chunks_for(
    num_nodes: int, embedding_dim: int = 64, compute_dtype=jnp.float32
) -> int:
    """Chunk count so each source sub-table stays under the (dim- and
    dtype-aware) gather knee (1 = don't chunk)."""
    return max(1, -(-num_nodes // knee_rows_for(embedding_dim, compute_dtype)))


def to_device_graph_auto(
    g: Graph, compute_dtype=jnp.float32, dense_dtype=None, embedding_dim: int = 64,
    fuse_layers: bool = True,
):
    """Plain or source-chunked device graph by the gather-knee rule.

    Single-device entry points (trainer, test mode, serving) share this
    so a big graph propagates at the fast chunked rate everywhere; the
    sharded trainers keep the plain layout (row-sharding already puts
    each device's shard under the knee).  ``fuse_layers=False`` skips
    the merge-skip permuted views (~2x graph HBM: the hub-dense matrix
    resident in both column orders plus duplicated bucket indices) —
    right for one-shot propagation like serving load (round-3
    ADVICE.md)."""
    n_chunks = num_chunks_for(g.num_nodes, embedding_dim, compute_dtype)
    if n_chunks > 1:
        return to_device_chunked_graph(
            g, n_chunks, compute_dtype=compute_dtype, dense_dtype=dense_dtype
        )
    return to_device_graph(
        g, compute_dtype=compute_dtype, dense_dtype=dense_dtype,
        fuse_layers=fuse_layers,
    )


class ChunkedDeviceGraph(NamedTuple):
    """Device-resident source-chunked, destination-sliced adjacency
    (pytree of jnp arrays).

    ``chunk_bucket_idx[c][t]`` holds chunk-local neighbor ids for
    destination slice t; ``chunk_gather_idx[c][t]`` is slice-local.  The
    chunk/slice counts and chunk row span are recovered from the pytree
    structure and the embedding shape (``chunk_rows = ceil(N / C)``), so
    nothing here is a static scalar.
    """

    chunk_bucket_idx: Tuple[Tuple[Tuple[jax.Array, ...], ...], ...]
    chunk_bucket_w: Tuple[Tuple[Tuple[jax.Array, ...], ...], ...]
    chunk_gather_idx: Tuple[Tuple[jax.Array, ...], ...]  # [C][S] x [slice_rows_t]
    dense_mat: jax.Array                       # [H, num_nodes]
    dense_gather_idx: jax.Array                # [num_nodes] -> H rows + zeros


def to_device_chunked_graph(
    g: Graph, num_chunks: int, compute_dtype=jnp.float32, dense_dtype=None
) -> ChunkedDeviceGraph:
    from gcn_recommendation_tpu.graph.build import build_chunked_ell

    if dense_dtype is None:
        dense_dtype = compute_dtype
    per_cell_buckets, per_cell_gidx, dense_gidx = build_chunked_ell(
        g, num_chunks
    )
    return ChunkedDeviceGraph(
        chunk_bucket_idx=tuple(
            tuple(
                tuple(jnp.asarray(b.nbr_idx) for b in buckets)
                for buckets in cell_buckets
            )
            for cell_buckets in per_cell_buckets
        ),
        chunk_bucket_w=tuple(
            tuple(
                tuple(jnp.asarray(b.nbr_w, dtype=compute_dtype) for b in buckets)
                for buckets in cell_buckets
            )
            for cell_buckets in per_cell_buckets
        ),
        chunk_gather_idx=tuple(
            tuple(jnp.asarray(gi) for gi in cell_gidx)
            for cell_gidx in per_cell_gidx
        ),
        dense_mat=jnp.asarray(g.dense_mat, dtype=dense_dtype),
        dense_gather_idx=jnp.asarray(dense_gidx),
    )


def _chunked_matvec(
    emb, chunk_bucket_idx, chunk_bucket_w, chunk_gather_idx, dense_mat, dense_gather_idx
):
    n, d = emb.shape
    c = len(chunk_gather_idx)
    s = len(chunk_gather_idx[0])
    chunk_rows = -(-n // c)
    pad = c * chunk_rows - n
    src = jnp.concatenate([emb, jnp.zeros((pad, d), emb.dtype)]) if pad else emb

    # cross-chunk/hub partial sums accumulate in f32 even in bf16 storage
    # mode — same invariant as the plain ELL reductions (a bf16 acc would
    # round each destination row C+1 times); one cast at the end.
    # Per-destination-slice accumulators: each cell's merge gather sources
    # a parts table of <= slice_rows rows (under the gather knee), and the
    # slice outputs concatenate directly in node order.
    slice_acc = [None] * s
    for ci in range(c):
        sub = jax.lax.dynamic_slice_in_dim(src, ci * chunk_rows, chunk_rows, 0)
        for ti in range(s):
            parts = []
            for idx, w in zip(chunk_bucket_idx[ci][ti], chunk_bucket_w[ci][ti]):
                parts.append(_bucket_reduce(sub, idx, w))
            parts.append(jnp.zeros((1, d), jnp.float32))
            out_ct = jnp.concatenate(parts, axis=0)[chunk_gather_idx[ci][ti]]
            slice_acc[ti] = out_ct if slice_acc[ti] is None else slice_acc[ti] + out_ct
    acc = jnp.concatenate(slice_acc, axis=0) if s > 1 else slice_acc[0]
    if dense_mat.shape[0]:
        hub_rows = jnp.dot(
            dense_mat, emb.astype(dense_mat.dtype),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32)
        hub_rows = jnp.concatenate([hub_rows, jnp.zeros((1, d), jnp.float32)])
        acc = acc + hub_rows[dense_gather_idx]
    return acc.astype(emb.dtype)


@jax.custom_vjp
def propagate_chunked(
    emb, chunk_bucket_idx, chunk_bucket_w, chunk_gather_idx, dense_mat, dense_gather_idx
):
    """Scatter-free SpMM over the source-chunked ELL adjacency."""
    return _chunked_matvec(
        emb, chunk_bucket_idx, chunk_bucket_w, chunk_gather_idx, dense_mat,
        dense_gather_idx,
    )


def _propagate_chunked_fwd(emb, cbi, cbw, cgi, dm, dgi):
    return _chunked_matvec(emb, cbi, cbw, cgi, dm, dgi), (cbi, cbw, cgi, dm, dgi)


def _propagate_chunked_bwd(res, g):
    # same symmetric-adjacency trick as propagate_ell: A^T = A, so the
    # backward pass is the identical chunked gather kernel on the cotangent
    cbi, cbw, cgi, dm, dgi = res
    return _chunked_matvec(g, cbi, cbw, cgi, dm, dgi), None, None, None, None, None


propagate_chunked.defvjp(_propagate_chunked_fwd, _propagate_chunked_bwd)
