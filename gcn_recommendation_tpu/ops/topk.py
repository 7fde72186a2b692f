"""Full-catalog scoring + seen-item masking + top-k.

Reference: evaluate() scores each 1024-user batch against the full item
catalog with a dense matmul, masks seen train items to -1e10 with a
host-side Python loop, then torch.topk (main.py:415-426).

TPU-native version: everything fused under one jit —

* scores = U_batch @ I^T on the MXU;
* masking is a single batched scatter with padded per-user filter lists
  (pad index = num_items, dropped as out-of-bounds — no host loop);
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


def masked_topk_scores(
    user_emb_batch: jax.Array,  # [B, d]
    item_emb: jax.Array,        # [I, d]
    filter_idx: jax.Array,      # [B, F] int32, padded with I (out of bounds)
    k: int,
):
    """Score a user batch against the catalog, mask seen items, top-k."""
    scores = jnp.dot(
        user_emb_batch, item_emb.T, preferred_element_type=jnp.float32
    )
    b = user_emb_batch.shape[0]
    rows = jnp.arange(b, dtype=filter_idx.dtype)[:, None]
    scores = scores.at[rows, filter_idx].set(MASK_VALUE, mode="drop")
    return jax.lax.top_k(scores, k)


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
    u = jnp.take(user_emb, users, axis=0)
    _, topk_idx = masked_topk_scores(u, item_emb, filter_idx, k)
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
