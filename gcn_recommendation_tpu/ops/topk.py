"""Full-catalog scoring + seen-item masking + top-k.

Reference: evaluate() scores each 1024-user batch against the full item
catalog with a dense matmul, masks seen train items to -1e10 with a
host-side Python loop, then torch.topk (main.py:415-426).

TPU-native version: everything fused under one jit —

* scores = U_batch @ I^T on the MXU;
* masking uses padded per-user filter lists (pad index = num_items) with
  an adaptive strategy — fused comparison masking for small filter widths
  (no scatter at all), batched scatter for wide ones (see ``masked_topk``);
* ``jax.lax.top_k`` on device;
* hit / NDCG@k reduction on device (main.py:430-438 semantics:
  recall = hit indicator, ndcg = 1/log2(pos+2) if hit else 0).

The sharded variant (items row-sharded over the model axis, local top-k +
merge) lives in parallel/spmd.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MASK_VALUE = -1e10  # main.py:424

# Crossover between comparison and scatter masking (see masked_topk).
# Compare is O(B*F*N) VPU work while scatter is ~N-independent, so the
# crossover is on the F*N product.  Calibrated on TPU v5e with
# tools/exp_topk_mask.py at N=20k: compare wins up to F=32 measured
# (1.04 vs 1.82 ms at F=8, 1.27 vs 1.45 at F=32 per 1024-user batch),
# scatter wins at F=128 (1.99 vs 6.16 ms) -> crossover ~64*20k work.
COMPARE_MAX_WORK = 64 * 20_000
# Width cap independent of N (guards tiny catalogs where WORK/N blows up)
COMPARE_MAX_F_CAP = 512


def compare_max_f(num_items: int) -> int:
    """Largest filter width the comparison mask should handle at this
    catalog size (used for the eval tier split in train/evaluate.py)."""
    return max(1, min(COMPARE_MAX_F_CAP, COMPARE_MAX_WORK // max(num_items, 1)))


def masked_topk(scores: jax.Array, filter_idx: jax.Array, k: int, *, strategy: str = "auto"):
    """Top-k of ``scores`` [B, N] with per-row ``filter_idx`` entries
    masked to MASK_VALUE.  Pad filter slots with N (out of range).

    Three exact-equivalent strategies (measured in
    tools/exp_topk_mask.py; timings per 1024x20k batch, k=20):

    * ``compare`` — ``seen[b, i] = any_f(filter[b, f] == i)`` fused into
      the mask select; O(B*F*N) VPU compares but *no scatter*.  Fastest
      for small F (1.04 ms at F=8 vs 0.75 ms unmasked).
    * ``scatter`` — mask the score matrix with one batched scatter.
      XLA scatters serialize per element (~F per row), but the cost is
      independent of N; wins for wide filter lists (1.99 ms at F=128).
    * ``fixup`` — top-k of the *raw* scores widened to k+F, mark seen
      entries in the short list by comparison, re-top-k.  Exact
      (removing <= F seen from the top k+F leaves >= k unseen; the
      second top_k breaks ties by position in the first list, which is
      value/index ordered exactly like full masking) — but
      ``lax.top_k(k+F)`` is far costlier than ``top_k(k)`` on TPU
      (2.75 ms already at F=8), so it never wins; kept for reference.

    ``auto`` picks compare while F*N is under the measured crossover
    (``compare_max_f``), scatter otherwise.
    """
    b, n = scores.shape
    f = filter_idx.shape[1]
    if strategy == "auto":
        strategy = "compare" if f <= compare_max_f(n) else "scatter"
    if strategy == "scatter":
        rows = jnp.arange(b, dtype=filter_idx.dtype)[:, None]
        scores = scores.at[rows, filter_idx].set(MASK_VALUE, mode="drop")
        return jax.lax.top_k(scores, k)
    if strategy == "compare":
        iota = jnp.arange(n, dtype=filter_idx.dtype)
        seen = jnp.any(filter_idx[:, :, None] == iota[None, None, :], axis=1)
        return jax.lax.top_k(jnp.where(seen, MASK_VALUE, scores), k)
    assert strategy == "fixup", strategy
    if k + f >= n:
        raise ValueError(
            f"fixup masking needs k + F < N (k={k}, F={f}, N={n}); "
            "use strategy='scatter'"
        )
    vals, idx = jax.lax.top_k(scores, k + f)
    seen = jnp.any(idx[:, :, None] == filter_idx[:, None, :], axis=-1)
    vals = jnp.where(seen, MASK_VALUE, vals)
    vals2, order = jax.lax.top_k(vals, k)
    return vals2, jnp.take_along_axis(idx, order, axis=1)


def masked_topk_scores(
    user_emb_batch: jax.Array,  # [B, d]
    item_emb: jax.Array,        # [I, d]
    filter_idx: jax.Array,      # [B, F] int32, padded with I (out of bounds)
    k: int,
    *,
    strategy: str = "auto",
):
    """Score a user batch against the catalog, mask seen items, top-k."""
    scores = jnp.dot(
        user_emb_batch, item_emb.T, preferred_element_type=jnp.float32
    )
    return masked_topk(scores, filter_idx, k, strategy=strategy)


def topk_hit_metrics(topk_idx, true_items, valid):
    """(recall_sum, ndcg_sum, count) of a top-k index batch against the
    leave-one-out held-out items — main.py:430-438 semantics (recall =
    hit indicator, ndcg = 1/log2(pos+2) if hit else 0), masked by the
    batch-padding ``valid`` flags.  Shared by the single-device and
    sharded evaluators so the metric exists in exactly one place."""
    hit_matrix = topk_idx == true_items[:, None]
    hit = jnp.any(hit_matrix, axis=1)
    pos = jnp.argmax(hit_matrix, axis=1)
    ndcg = jnp.where(hit, 1.0 / jnp.log2(pos.astype(jnp.float32) + 2.0), 0.0)
    recall = hit.astype(jnp.float32)
    validf = valid.astype(jnp.float32)
    return (
        jnp.sum(recall * validf),
        jnp.sum(ndcg * validf),
        jnp.sum(validf),
    )


def merge_topk_candidates(all_vals, all_idx, k):
    """Re-select the global top-k from per-shard candidates.

    ``all_vals``/``all_idx`` are [m, B, k] stacks (one slice per item
    shard, global indices); returns ([B, k] values, [B, k] indices).
    Shared by the per-batch and scanned sharded top-k paths."""
    m, b, kk = all_vals.shape
    cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, m * kk)
    cand_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, m * kk)
    best_vals, pos = jax.lax.top_k(cand_vals, k)
    best_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return best_vals, best_idx


def _topk_eval_batch(user_emb, item_emb, users, true_items, filter_idx, valid, k):
    """Unjitted body of topk_eval_batch — reused inside the scanned
    whole-eval dispatch (train/evaluate.py)."""
    u = jnp.take(user_emb, users, axis=0)
    _, topk_idx = masked_topk_scores(u, item_emb, filter_idx, k)
    return topk_hit_metrics(topk_idx, true_items, valid)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_eval_batch(
    user_emb: jax.Array,    # [U, d] final user embeddings
    item_emb: jax.Array,    # [I, d] final item embeddings
    users: jax.Array,       # [B] user ids of this eval batch
    true_items: jax.Array,  # [B] leave-one-out held-out item per user
    filter_idx: jax.Array,  # [B, F] padded seen-item lists (pad = num_items)
    valid: jax.Array,       # [B] bool — False on batch padding rows
    k: int,
):
    """Per-user recall/NDCG@k contributions for one eval batch.

    Returns (recall_sum, ndcg_sum, count) so the caller can average across
    batches exactly like the reference's np.mean over per-user lists
    (main.py:439).
    """
    return _topk_eval_batch(
        user_emb, item_emb, users, true_items, filter_idx, valid, k
    )


@functools.partial(jax.jit, static_argnames=("k",))
def topk_eval_scan(
    user_emb: jax.Array,    # [U, d]
    item_emb: jax.Array,    # [I, d]
    users: jax.Array,       # [nb, B]
    true_items: jax.Array,  # [nb, B]
    filter_idx: jax.Array,  # [nb, B, F]
    valid: jax.Array,       # [nb, B]
    k: int,
):
    """All eval batches of one filter-width tier in ONE device dispatch.

    The per-batch loop used to pay a full host<->device round trip per
    1024 users (dominant on the remote-tunnel TPU: ~110 ms/batch against
    ~6 ms of compute at 200k items).  Scanning the stacked batches keeps
    the whole tier on device and returns three scalars.
    """

    def body(carry, batch):
        u, t, f, v = batch
        r, n, c = _topk_eval_batch(user_emb, item_emb, u, t, f, v, k)
        return (carry[0] + r, carry[1] + n, carry[2] + c), None

    init = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
    (r, n, c), _ = jax.lax.scan(body, init, (users, true_items, filter_idx, valid))
    return r, n, c
