"""Multi-chip SPMD execution: DP x TP over a ('data', 'model') mesh.

The reference has no distributed code at all (SURVEY.md §2.2 — single
GPU, no collectives).  This module is the scale-out layer the north star
requires:

* **Tensor parallelism**: the embedding tables (the model's only large
  parameters) are row-sharded over the ``model`` axis via NamedSharding;
  propagation gathers over sharded tables, and XLA/GSPMD inserts the
  all-gather / reduce-scatter pairs over ICI (the scaling-book recipe:
  pick a mesh, annotate shardings, let the compiler place collectives).
* **Data parallelism**: BPR batches are sharded over the ``data`` axis
  with an explicit sharding constraint; gradient psum is inserted by XLA
  from the loss mean.
* **Distributed top-k** (explicit shard_map): the item catalog is
  row-sharded over ``model``; each shard computes a local masked top-k,
  then shards all-gather their (value, global-index) candidates and
  re-select the global top-k — the cross-shard merge the reference's
  single-GPU ``torch.topk`` (main.py:426) never needed.

Pipeline parallelism is structurally inapplicable (3 SpMMs deep, no
weight layers between them — SURVEY.md §2.2), and expert parallelism has
no analogue here; both are intentionally unsupported.
"""

from __future__ import annotations

import functools
from typing import Optional


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gcn_recommendation_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from gcn_recommendation_tpu.ops.spmm import DeviceGraph
from gcn_recommendation_tpu.ops.topk import (
    MASK_VALUE,
    masked_topk,
    merge_topk_candidates,
    topk_hit_metrics,
)
from gcn_recommendation_tpu.train.trainer import Trainer


# Replicating a table this large is almost certainly an error (the
# embedding tables ARE the model); smaller non-divisible leaves (fusion
# kernel/bias, Adam count) are legitimately replicated.
_REPLICATION_WARN_ROWS = 1024


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Row-shard every 2-D table over the model axis; replicate the rest.

    Tables are padded to a model-axis multiple by the model
    (models/lightgcn.py::set_row_multiple — ShardedTrainer arranges this),
    so every large table divides evenly; a *large* non-divisible leaf
    means the padding contract was bypassed and replication would silently
    throw away the TP memory win, so it warns loudly.
    """

    n_model = mesh.shape[MODEL_AXIS]

    def place(x):
        if getattr(x, "ndim", 0) >= 2 and x.shape[0] > 0:
            if x.shape[0] % n_model == 0:
                return jax.device_put(x, NamedSharding(mesh, P(MODEL_AXIS)))
            if x.shape[0] >= _REPLICATION_WARN_ROWS and n_model > 1:
                import warnings

                warnings.warn(
                    f"replicating a large table {tuple(x.shape)} — rows not "
                    f"divisible by the {n_model}-way model axis; pad via "
                    "model.set_row_multiple (ShardedTrainer does this "
                    "automatically)",
                    stacklevel=3,
                )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params)


def shard_graph(graph: DeviceGraph, mesh: Mesh) -> DeviceGraph:
    """Shard bucket rows over the model axis; small index arrays replicate."""
    model_rows = NamedSharding(mesh, P(MODEL_AXIS))
    repl = NamedSharding(mesh, P())

    n_model = mesh.shape[MODEL_AXIS]

    def place_bucket(x):
        if x.shape[0] % n_model == 0 and x.shape[0] > 0:
            return jax.device_put(x, model_rows)
        if x.shape[0] >= _REPLICATION_WARN_ROWS and n_model > 1:
            import warnings

            warnings.warn(
                f"replicating a large graph bucket {tuple(x.shape)} — rows "
                f"not divisible by the {n_model}-way model axis; pad buckets "
                "via graph.build.pad_ell_rows (ShardedTrainer does this "
                "automatically)",
                stacklevel=3,
            )
        return jax.device_put(x, repl)

    return DeviceGraph(
        src=jax.device_put(graph.src, repl),
        dst=jax.device_put(graph.dst, repl),
        weight=jax.device_put(graph.weight, repl),
        bucket_nbr_idx=tuple(place_bucket(b) for b in graph.bucket_nbr_idx),
        bucket_nbr_w=tuple(place_bucket(b) for b in graph.bucket_nbr_w),
        gather_idx=jax.device_put(graph.gather_idx, repl),
        dense_mat=place_bucket(graph.dense_mat)
        if graph.dense_mat.shape[0]
        else jax.device_put(graph.dense_mat, repl),
    )


class ShardedTrainer(Trainer):
    """Trainer whose state and graph live sharded on a 2-D mesh.

    Source-chunked gathers are disabled here: row-sharding the tables
    over the mesh already brings each device's shard under the gather
    knee (PERF.md), and shard_graph expects the plain ELL layout.

    The step/epoch functions are identical to the single-device Trainer —
    sharding comes entirely from input placement plus one batch-sharding
    constraint, and XLA compiles the collectives.
    """

    graph_chunking = False
    # the GSPMD path keeps the per-layer propagation kernel (measured /
    # tested sharding behavior); skip building+uploading the merge-skip
    # permuted views shard_graph would drop anyway
    graph_fuse_layers = False

    def __init__(self, config, model, bundle, mesh: Mesh, logger=None):
        self.mesh = mesh
        n_model = mesh.shape[MODEL_AXIS]
        if n_model > 1:
            # pad the tables (and, via Trainer._host_graph, the adjacency's
            # node space) so row-sharding works for arbitrary vocab sizes.
            # Even when every vocab divides the mesh, set_row_multiple is
            # applied so _host_graph pads the ELL bucket *rows* too —
            # otherwise a non-divisible bucket silently replicates
            # (round-2 ADVICE.md).  Work on a copy: the caller's model may
            # be shared with an unpadded single-device trainer.
            import copy

            padded = model.needs_row_padding(n_model)
            model = copy.copy(model)
            model.set_row_multiple(n_model)
            if padded:
                print(
                    f"TP padding: tables -> multiples of {n_model} "
                    f"(users {model.num_users}->{model.num_users_pad}, "
                    f"items {model.num_items}->{model.num_items_pad}, "
                    f"brands {model.num_brands}->{model.num_brands_pad})"
                )
        super().__init__(config, model, bundle, logger=logger)
        repl = NamedSharding(mesh, P())
        self.arrays = self.arrays._replace(
            graph=shard_graph(self.arrays.graph, mesh),
            train_users=jax.device_put(self.arrays.train_users, repl),
            train_items=jax.device_put(self.arrays.train_items, repl),
            user_ptr=jax.device_put(self.arrays.user_ptr, repl),
            flat_items=jax.device_put(self.arrays.flat_items, repl),
            item_to_brand=jax.device_put(self.arrays.item_to_brand, repl),
        )

    def _batch_loss(self, params, arrays, users, pos, neg):
        # pin the batch to the data axis; grads psum falls out of the mean
        users = jax.lax.with_sharding_constraint(
            users, NamedSharding(self.mesh, P(DATA_AXIS))
        )
        pos = jax.lax.with_sharding_constraint(
            pos, NamedSharding(self.mesh, P(DATA_AXIS))
        )
        neg = jax.lax.with_sharding_constraint(
            neg, NamedSharding(self.mesh, P(DATA_AXIS))
        )
        return super()._batch_loss(params, arrays, users, pos, neg)

    def init_state(self, key):
        params, opt_state = super().init_state(key)
        return self._place_state(params, opt_state)

    def _place_state(self, params, opt_state):
        # also re-shards state restored from a checkpoint on --resume
        return (
            shard_params(params, self.mesh),
            shard_params(opt_state, self.mesh),
        )

    def validate(self, params):
        return validate_with_sharded_topk(self, params)


def validate_with_sharded_topk(trainer, params):
    """Distributed validation shared by every mesh-sharded trainer
    (GSPMD ShardedTrainer and the halo-exchange HaloTrainer): forward via
    the trainer's own propagation schedule, then the items-row-sharded
    local-top-k + all-gather merge evaluator, with user batches split
    over the data axis (round-2 VERDICT #3 — pure-DP meshes used to fall
    back to a fully replicated evaluator and (d, m) meshes computed every
    eval d times).  Only a trivial 1x1 mesh uses the single-device path."""
    from gcn_recommendation_tpu.train.evaluate import build_eval_batches

    if trainer.mesh.size <= 1:
        return Trainer.validate(trainer, params)
    fu, fi, *_ = trainer._forward_eval(params)
    if trainer._eval_batches is None:
        trainer._eval_batches = build_eval_batches(
            trainer.bundle.val,
            trainer.bundle.train,
            trainer.bundle.num_users,
            trainer.bundle.num_items,
            trainer.config.eval_user_batch,
        )
    return evaluate_sharded(
        trainer.mesh,
        fu,
        fi,
        trainer.bundle.val,
        trainer.bundle.train,
        trainer.bundle.num_users,
        trainer.bundle.num_items,
        trainer.config.top_k,
        trainer.config.eval_user_batch,
        batches=trainer._eval_batches,
    )


# ---------------------------------------------------------------------------
# Distributed top-k (explicit shard_map)
# ---------------------------------------------------------------------------

def _local_masked_topk(
    u_emb, item_shard, filter_idx, k, shard_items, axis, num_valid_items=None
):
    """Per-shard masked top-k with global item indices.

    ``num_valid_items`` (static), when given, masks the zero pad rows at
    global column >= num_valid_items by index comparison — cheaper than
    carrying the pad ids in every user's filter list.

    ``k`` may exceed ``shard_items`` (legitimate when the merged catalog
    across shards is still >= k): the local top-k is clamped and padded
    back to k with MASK_VALUE sentinels, which the cross-shard merge
    then never selects ahead of real candidates.  Pad slots carry an
    out-of-catalog *index* sentinel too (num_valid_items, or the padded
    catalog size) — if the total unmasked candidates across shards are
    fewer than k, the merged top-k must not fabricate real item ids.
    """
    scores = jnp.dot(u_emb, item_shard.T, preferred_element_type=jnp.float32)
    return _mask_local_topk(
        scores, filter_idx, k, shard_items, axis, num_valid_items
    )


def _mask_local_topk(
    scores, filter_idx, k, shard_items, axis, num_valid_items=None
):
    """Shard-local pad-masking + filter translation + top-k + sentinel
    padding, shared by the f32 and int8 scoring paths (the docstring
    above describes the semantics)."""
    idx = jax.lax.axis_index(axis)
    offset = idx * shard_items
    if num_valid_items is not None:
        col_global = offset + jnp.arange(shard_items, dtype=jnp.int32)
        scores = jnp.where(col_global[None, :] >= num_valid_items, MASK_VALUE, scores)
    # translate global filter ids into this shard's local range; out-of-range
    # ids map to shard_items (the pad index masked_topk ignores)
    local_filter = filter_idx - offset
    local_filter = jnp.where(
        (filter_idx >= offset) & (filter_idx < offset + shard_items),
        local_filter,
        shard_items,  # out-of-bounds -> dropped
    )
    kk = min(k, shard_items)
    vals, loc = masked_topk(scores, local_filter, kk)
    # index sentinel >= the catalog size, so a non-candidate slot that
    # survives the merge (fewer than k real candidates overall) is
    # distinguishable from every real item id.  Covers both the kk < k
    # pad slots below AND masked/pad entries masked_topk itself returns
    # at MASK_VALUE when a shard has fewer than kk unmasked items.
    sentinel = (
        num_valid_items
        if num_valid_items is not None
        else shard_items * jax.lax.axis_size(axis)
    )
    loc = jnp.where(vals == MASK_VALUE, sentinel - offset, loc)
    if kk < k:
        b = vals.shape[0]
        vals = jnp.concatenate(
            [vals, jnp.full((b, k - kk), MASK_VALUE, vals.dtype)], axis=1
        )
        loc = jnp.concatenate(
            [loc, jnp.full((b, k - kk), sentinel - offset, loc.dtype)], axis=1
        )
    return vals, loc + offset


def sharded_topk_eval_batch(
    mesh: Mesh,
    user_emb_batch: jax.Array,  # [B, d] replicated
    item_emb: jax.Array,        # [I_pad, d] row-sharded over model axis
    filter_idx: jax.Array,      # [B, F] global item ids (pad >= I)
    k: int,
    num_valid_items: Optional[int] = None,
):
    """Distributed masked top-k: local top-k per item shard + global merge.

    ``item_emb`` must be padded to a multiple of the model-axis size; pass
    ``num_valid_items`` (the true catalog size) so the zero pad rows are
    masked out — a pad row scores 0, which *can* reach the top-k whenever a
    user's real-item scores are all negative.  Returns (values,
    global_indices) of shape [B, k].
    """
    n_model = mesh.shape[MODEL_AXIS]
    i_pad = item_emb.shape[0]
    assert i_pad % n_model == 0, "pad the item table to the model-axis size"
    shard_items = i_pad // n_model

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        # after the all_gather every shard computes the identical merge, so
        # the outputs are replicated even though the VMA analysis can't see it
        check_vma=False,
    )
    def run(u_emb, item_shard, filt):
        vals, gidx = _local_masked_topk(
            u_emb, item_shard, filt, k, shard_items, MODEL_AXIS,
            num_valid_items=num_valid_items,
        )
        # gather the k candidates from every shard and re-select
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS)   # [m, B, k]
        all_idx = jax.lax.all_gather(gidx, MODEL_AXIS)
        return merge_topk_candidates(all_vals, all_idx, k)

    return run(user_emb_batch, item_emb, filter_idx)


def sharded_quantized_topk_batch(
    mesh: Mesh,
    user_emb_batch: jax.Array,  # [B, d] f32, replicated
    item_q: jax.Array,          # [I_pad, d] int8, row-sharded over model axis
    item_scale: jax.Array,      # [I_pad, 1] f32, row-sharded over model axis
    filter_idx: jax.Array,      # [B, F] global item ids (pad >= I)
    k: int,
    num_valid_items: Optional[int] = None,
):
    """Distributed masked top-k over an int8 catalog: per-shard MXU
    int8 x int8 -> s32 scoring (ops/quant.py::quantized_topk_scores
    semantics) + the same local-top-k / all-gather merge as
    sharded_topk_eval_batch — so catalogs too large for one chip still
    get the 4x int8 footprint win (round-3 VERDICT #7).

    The user batch is replicated, so every shard quantizes it to the
    identical int8 tensor; per-shard scores therefore equal the
    single-device kernel's columns exactly (integer accumulation).
    """
    n_model = mesh.shape[MODEL_AXIS]
    i_pad = item_q.shape[0]
    assert i_pad % n_model == 0, "pad the item table to the model-axis size"
    shard_items = i_pad // n_model

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(MODEL_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,  # post-all_gather merge is replicated (see above)
    )
    def run(u_emb, q_shard, scale_shard, filt):
        u_absmax = jnp.max(jnp.abs(u_emb), axis=1, keepdims=True)
        u_scale = jnp.maximum(u_absmax, 1e-12) / 127.0
        u_q = jnp.clip(jnp.round(u_emb / u_scale), -127, 127).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            u_q, q_shard, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = s32.astype(jnp.float32) * u_scale * scale_shard[:, 0][None, :]
        vals, gidx = _mask_local_topk(
            scores, filt, k, shard_items, MODEL_AXIS,
            num_valid_items=num_valid_items,
        )
        all_vals = jax.lax.all_gather(vals, MODEL_AXIS)
        all_idx = jax.lax.all_gather(gidx, MODEL_AXIS)
        return merge_topk_candidates(all_vals, all_idx, k)

    return run(user_emb_batch, item_q, item_scale, filter_idx)


def pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad the leading dim to a multiple (for even row sharding)."""
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x
    pad = np.zeros((target - n,) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


@functools.lru_cache(maxsize=None)
def _sharded_eval_scan(
    mesh: Mesh, k: int, shard_items: int, num_items: int, data_sharded: bool
):
    """Jitted shard_map scan over stacked eval batches: the whole tier —
    score, mask, local top-k, all-gather merge, hit/NDCG reduction — runs
    as ONE device dispatch and returns three scalars.

    ``data_sharded`` splits every eval batch's user dim over the data
    axis (round-2 VERDICT #3: the batches used to be replicated, so a
    (2,4) mesh computed every eval twice and pure-DP meshes not at all):
    each data shard scores only its ``B / n_data`` users against the
    item shards on its model axis, and the three metric scalars psum
    over ``data`` at the end — eval wall-clock now scales with both mesh
    axes.  Falls back to replicated batches when the batch size does not
    divide the data axis.

    Mirrors ops/topk.py::topk_eval_scan; the per-batch dispatch loop paid
    a host round trip per 1024 users (~110 ms on the remote tunnel), plus
    a host-side metric pass.  Cached per (mesh, k, shard, catalog)."""

    if data_sharded:
        batch_specs = (
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS, None),
            P(None, DATA_AXIS),
        )
    else:
        batch_specs = (P(), P(), P(), P())

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)) + batch_specs,
        out_specs=(P(), P(), P()),
        # after the model-axis all_gather (and the data-axis psum) every
        # shard holds the identical scalars even though the VMA analysis
        # can't see it
        check_vma=False,
    )
    def run(fu, item_shard, users, true_items, filt, valid):
        def body(carry, batch):
            us, ts, fs, vs = batch
            u = jnp.take(fu, us, axis=0)
            vals, gidx = _local_masked_topk(
                u, item_shard, fs, k, shard_items, MODEL_AXIS,
                num_valid_items=num_items,
            )
            all_vals = jax.lax.all_gather(vals, MODEL_AXIS)  # [m, B_local, k]
            all_idx = jax.lax.all_gather(gidx, MODEL_AXIS)
            _, best_idx = merge_topk_candidates(all_vals, all_idx, k)
            r, n, c = topk_hit_metrics(best_idx, ts, vs)
            return (carry[0] + r, carry[1] + n, carry[2] + c), None

        init = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        (r, n, c), _ = jax.lax.scan(
            body, init, (users, true_items, filt, valid)
        )
        if data_sharded:
            r = jax.lax.psum(r, DATA_AXIS)
            n = jax.lax.psum(n, DATA_AXIS)
            c = jax.lax.psum(c, DATA_AXIS)
        return r, n, c

    return jax.jit(run)


def evaluate_sharded(
    mesh: Mesh,
    fu: jax.Array,          # [U, d] final user embeddings
    fi: jax.Array,          # [I, d] final item embeddings
    eval_inter,
    filter_inter,
    num_users: int,
    num_items: int,
    k: int,
    batch_size: int = 1024,
    batches=None,
):
    """Leave-one-out Recall/NDCG@k with the distributed top-k.

    Same protocol as train.evaluate (main.py:404-439 semantics), items
    row-sharded over the model axis, local top-k + all-gather merge.
    Batches come from train/evaluate.py::build_eval_batches (a
    filter-width tier ladder, padded static shapes) and each tier runs
    as one scanned dispatch; pass prebuilt ``batches`` to reuse them
    across validations.
    """
    from gcn_recommendation_tpu.train.evaluate import build_eval_batches

    if batches is None:
        batches = build_eval_batches(
            eval_inter, filter_inter, num_users, num_items, batch_size
        )
    if not batches:
        return 0.0, 0.0

    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    i, d = fi.shape
    i_pad = -(-i // (n_model * 8)) * n_model * 8
    fi = jnp.asarray(fi)
    if i_pad != i:
        fi = jnp.concatenate([fi, jnp.zeros((i_pad - i, d), fi.dtype)])
    item_sharded = jax.device_put(fi, NamedSharding(mesh, P(MODEL_AXIS, None)))
    fu_repl = jax.device_put(jnp.asarray(fu), NamedSharding(mesh, P()))
    # user batches split over the data axis whenever the static batch
    # width divides it (build_eval_batches pads every tier to batch_size)
    data_sharded = n_data > 1 and all(b[0].shape[1] % n_data == 0 for b in batches)
    run = _sharded_eval_scan(mesh, k, i_pad // n_model, num_items, data_sharded)

    recall_sum = ndcg_sum = count = 0.0
    for bu, bt, filt, valid in batches:
        r, n, c = run(fu_repl, item_sharded, bu, bt, filt, valid)
        recall_sum += float(r)
        ndcg_sum += float(n)
        count += float(c)
    if count == 0:
        return 0.0, 0.0
    return recall_sum / count, ndcg_sum / count
