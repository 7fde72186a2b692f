"""Leave-one-out full-catalog evaluation.

Protocol parity with reference evaluate() (main.py:404-439):

* one held-out item per user (dict(zip(...)) semantics: the *last*
  occurrence wins if a user appears twice in the eval frame);
* one GNN propagation per evaluation (main.py:413);
* per user batch: dense scores, seen-item masking, top-k, hit/NDCG;
* metric = mean over evaluated users.

TPU-native: batches are padded to static shapes, stacked per
filter-width tier (a geometric ladder, so heavy users don't inflate
everyone's padding), and the whole score->mask->topk->metric pipeline
for a tier runs as ONE scanned device dispatch
(ops/topk.py::topk_eval_scan); only three scalars come back to the
host per tier.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.data.loader import Interactions
from gcn_recommendation_tpu.data.sampler import membership_arrays, padded_filter_rows
from gcn_recommendation_tpu.ops.topk import compare_max_f, topk_eval_scan


def dedup_eval_users(eval_inter: Interactions) -> Tuple[np.ndarray, np.ndarray]:
    """(users, true_items) with last occurrence winning, like
    dict(zip(users, items)) at main.py:406."""
    users = eval_inter.user_idx
    items = eval_inter.item_idx
    # np.unique keeps the first occurrence; reverse to keep the last
    _, last_pos_rev = np.unique(users[::-1], return_index=True)
    pos = len(users) - 1 - last_pos_rev
    pos.sort()
    return users[pos], items[pos]


def build_eval_batches(
    eval_inter: Interactions,
    filter_inter: Interactions,
    num_users: int,
    num_items: int,
    batch_size: int = 1024,
):
    """Device-resident stacked eval batches, one stack per filter tier.

    Built once and reused across validations (the eval users and filter
    set never change during a training run; rebuilding + re-uploading
    the filter arrays every eval is pure host/transfer waste).  Each
    tier is a tuple (users [nb, B], true [nb, B], filt [nb, B, F],
    valid [nb, B]) consumed by ops.topk.topk_eval_scan in ONE device
    dispatch — the per-batch dispatch loop paid a full host round trip
    per 1024 users, which dominates on the remote-tunnel TPU.

    Multi-tier batching by filter-list width: users whose seen-set fits
    the comparison-mask crossover (``ops.topk.compare_max_f`` — scales
    inversely with catalog size) get narrow filter arrays and the
    scatter-free masking path; heavier users are laddered into
    geometric (x4) width tiers so nobody pads to the global power-law
    max — a single wide tier padded every heavy user's filter row to
    the heaviest user's seen-count, which at 500k-user scale meant
    multi-GB host arrays/uploads *and* max-width scatter masking for
    all of them.  Tiers with fewer than one batch of users coalesce
    upward (fewer dispatches/compiles).  The metric is a mean over
    users, so regrouping doesn't change it.
    """
    users, true_items = dedup_eval_users(eval_inter)
    if len(users) == 0:
        return []

    # CSR view of the filter set for padded batch construction
    f_ptr, f_items = membership_arrays(
        filter_inter.user_idx, filter_inter.item_idx, num_users
    )
    deg = f_ptr[1:] - f_ptr[:-1]

    # width-cap ladder: compare tier, then geometric scatter tiers
    c0 = compare_max_f(num_items)
    deg_u = deg[users]
    max_deg_u = int(deg_u.max()) if len(users) else 1
    caps = [c0]
    w = 32
    while w <= c0:
        w *= 4
    while w < max_deg_u:
        caps.append(w)
        w *= 4
    if caps[-1] < max_deg_u:
        caps.append(max_deg_u)

    tier_of = np.searchsorted(np.asarray(caps, dtype=np.int64), deg_u)
    counts = np.bincount(tier_of, minlength=len(caps))
    for i in range(len(caps) - 1):  # coalesce sub-batch tiers upward
        if 0 < counts[i] < batch_size:
            tier_of[tier_of == i] = i + 1
            counts[i + 1] += counts[i]
            counts[i] = 0
    tiers = [
        (users[tier_of == i], true_items[tier_of == i])
        for i in range(len(caps))
        if counts[i]
    ]

    stacks = []
    for t_users, t_items in tiers:
        fmax = max(1, int(deg[t_users].max()))
        nb = -(-len(t_users) // batch_size)
        total = nb * batch_size
        pad = total - len(t_users)
        bu = np.concatenate([t_users, np.zeros(pad, np.int32)])
        bt = np.concatenate([t_items, np.zeros(pad, np.int32)])
        valid = np.concatenate(
            [np.ones(len(t_users), bool), np.zeros(pad, bool)]
        )
        # padded seen-item lists; pad index = num_items (dropped as OOB)
        filt = np.full((total, fmax), num_items, dtype=np.int32)
        filt[: len(t_users)] = padded_filter_rows(
            f_ptr, f_items, t_users, fmax, num_items
        )

        stacks.append(
            (
                jnp.asarray(bu.reshape(nb, batch_size)),
                jnp.asarray(bt.reshape(nb, batch_size)),
                jnp.asarray(filt.reshape(nb, batch_size, fmax)),
                jnp.asarray(valid.reshape(nb, batch_size)),
            )
        )
    return stacks


def evaluate_batches(fu, fi, batches, k: int) -> Tuple[float, float]:
    """Recall@k / NDCG@k over prebuilt per-tier batch stacks —
    one device dispatch (and one scalar fetch) per tier."""
    recall_sum = ndcg_sum = count = 0.0
    for bu, bt, filt, valid in batches:
        r, n, c = topk_eval_scan(fu, fi, bu, bt, filt, valid, k)
        recall_sum += float(r)
        ndcg_sum += float(n)
        count += float(c)
    if count == 0:
        return 0.0, 0.0
    return recall_sum / count, ndcg_sum / count


def evaluate_embeddings(
    fu,
    fi,
    eval_inter: Interactions,
    filter_inter: Interactions,
    num_users: int,
    num_items: int,
    k: int,
    batch_size: int = 1024,
) -> Tuple[float, float]:
    """Recall@k / NDCG@k from precomputed final embeddings."""
    batches = build_eval_batches(
        eval_inter, filter_inter, num_users, num_items, batch_size
    )
    return evaluate_batches(fu, fi, batches, k)


def apply_cached(model, params, device_graph):
    """model.apply under jit, cached on the model so repeated evals
    don't retrace (shared by evaluate() and the trainers' validate)."""
    apply_jit = getattr(model, "_apply_jit", None)
    if apply_jit is None:
        apply_jit = jax.jit(model.apply)
        model._apply_jit = apply_jit
    return apply_jit(params, device_graph)


def evaluate(
    model,
    params,
    device_graph,
    eval_inter: Interactions,
    filter_inter: Interactions,
    num_users: int,
    num_items: int,
    k: int,
    batch_size: int = 1024,
) -> Tuple[float, float]:
    """Recall@k / NDCG@k over the eval interactions.

    ``filter_inter`` is the seen-set to mask: train for validation,
    train+val for test (main.py:576).  One propagation per eval
    (main.py:413), jitted with the graph as an argument (closure
    constants would bloat the compile payload); the jitted callable is
    cached on the model so repeated evals don't retrace.
    """
    fu, fi, _, _, _ = apply_cached(model, params, device_graph)
    return evaluate_embeddings(
        fu, fi, eval_inter, filter_inter, num_users, num_items, k, batch_size
    )
