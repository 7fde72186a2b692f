"""Top-k evaluation op vs. a numpy re-implementation of main.py:404-439."""

import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.ops.topk import MASK_VALUE, masked_topk_scores, topk_eval_batch


def _numpy_reference_eval(user_emb, item_emb, users, true_items, filter_lists, k):
    """Reference protocol: dense scores, mask seen, topk, hit/NDCG
    (main.py:415-438)."""
    recalls, ndcgs = [], []
    scores_all = user_emb[users] @ item_emb.T
    for j, u in enumerate(users):
        s = scores_all[j].copy()
        s[filter_lists[j]] = -1e10
        top = np.argsort(-s, kind="stable")[:k]
        hit = true_items[j] in top
        recalls.append(1.0 if hit else 0.0)
        if hit:
            pos = int(np.where(top == true_items[j])[0][0])
            ndcgs.append(1.0 / np.log2(pos + 2))
        else:
            ndcgs.append(0.0)
    return float(np.mean(recalls)), float(np.mean(ndcgs))


def test_masked_topk_masks_seen_items():
    rng = np.random.default_rng(0)
    B, I, d, k = 4, 50, 8, 5
    u = rng.standard_normal((B, d)).astype(np.float32)
    it = rng.standard_normal((I, d)).astype(np.float32)
    filt = np.full((B, 6), I, np.int32)  # padded with I = out-of-bounds
    filt[0, :3] = [1, 2, 3]
    vals, idx = masked_topk_scores(jnp.asarray(u), jnp.asarray(it), jnp.asarray(filt), k)
    assert not np.isin(np.asarray(idx[0]), [1, 2, 3]).any()
    assert np.asarray(vals).max() < -MASK_VALUE


def test_topk_eval_matches_numpy_reference():
    rng = np.random.default_rng(1)
    U, I, d, k = 60, 120, 16, 10
    user_emb = rng.standard_normal((U, d)).astype(np.float32)
    item_emb = rng.standard_normal((I, d)).astype(np.float32)
    users = np.arange(U, dtype=np.int32)
    true_items = rng.integers(0, I, U).astype(np.int32)
    # random filter lists of varying length
    filter_lists = [
        rng.choice(I, size=rng.integers(0, 8), replace=False) for _ in range(U)
    ]
    # ensure the true item isn't filtered
    filter_lists = [fl[fl != t] for fl, t in zip(filter_lists, true_items)]
    fmax = max(len(f) for f in filter_lists)
    filt = np.full((U, max(fmax, 1)), I, np.int32)
    for j, fl in enumerate(filter_lists):
        filt[j, : len(fl)] = fl

    rsum, nsum, cnt = topk_eval_batch(
        jnp.asarray(user_emb),
        jnp.asarray(item_emb),
        jnp.asarray(users),
        jnp.asarray(true_items),
        jnp.asarray(filt),
        jnp.ones(U, bool),
        k,
    )
    ref_r, ref_n = _numpy_reference_eval(
        user_emb, item_emb, users, true_items, filter_lists, k
    )
    np.testing.assert_allclose(float(rsum) / float(cnt), ref_r, rtol=1e-6)
    np.testing.assert_allclose(float(nsum) / float(cnt), ref_n, rtol=1e-5)


def test_topk_eval_padding_rows_ignored():
    rng = np.random.default_rng(2)
    U, I, d, k = 8, 30, 4, 3
    user_emb = rng.standard_normal((U, d)).astype(np.float32)
    item_emb = rng.standard_normal((I, d)).astype(np.float32)
    users = np.zeros(6, np.int32)
    true = np.zeros(6, np.int32)
    filt = np.full((6, 1), I, np.int32)
    valid = np.array([True, True, False, False, False, False])
    rsum, nsum, cnt = topk_eval_batch(
        jnp.asarray(user_emb), jnp.asarray(item_emb), jnp.asarray(users),
        jnp.asarray(true), jnp.asarray(filt), jnp.asarray(valid), k,
    )
    assert float(cnt) == 2.0


def test_eval_user_dedup_last_occurrence_wins():
    # dict(zip(users, items)) keeps the LAST item per user (main.py:406)
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.train.evaluate import dedup_eval_users

    inter = Interactions(
        np.array([3, 1, 3, 2], np.int32), np.array([10, 11, 12, 13], np.int32)
    )
    users, items = dedup_eval_users(inter)
    assert dict(zip(users.tolist(), items.tolist())) == {1: 11, 2: 13, 3: 12}


def test_full_evaluate_pipeline_vs_numpy(tiny_bundle):
    """evaluate() end-to-end vs a numpy re-implementation of the protocol."""
    import jax
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.ops.spmm import to_device_graph
    from gcn_recommendation_tpu.train.evaluate import dedup_eval_users, evaluate

    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=8, n_layers=2)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))
    dg = to_device_graph(bundle.graph)
    recall, ndcg = evaluate(
        model, params, dg, bundle.val, bundle.train,
        bundle.num_users, bundle.num_items, k=10, batch_size=64,
    )

    fu, fi, *_ = model.apply(params, dg)
    fu, fi = np.asarray(fu), np.asarray(fi)
    users, true_items = dedup_eval_users(bundle.val)
    seen = {}
    for u, i in zip(bundle.train.user_idx, bundle.train.item_idx):
        seen.setdefault(int(u), []).append(int(i))
    recalls, ndcgs = [], []
    for u, t in zip(users, true_items):
        s = fu[u] @ fi.T
        s[seen.get(int(u), [])] = -1e10
        top = np.argsort(-s, kind="stable")[:10]
        hit = t in top
        recalls.append(float(hit))
        ndcgs.append(1.0 / np.log2(int(np.where(top == t)[0][0]) + 2) if hit else 0.0)
    np.testing.assert_allclose(recall, np.mean(recalls), rtol=1e-6)
    np.testing.assert_allclose(ndcg, np.mean(ndcgs), rtol=1e-5)


def test_masked_topk_strategies_identical():
    """compare/fixup and scatter masking must agree exactly — incl. score
    ties, duplicate filter entries, and padded filter slots (ops/topk.py)."""
    import jax

    from gcn_recommendation_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(7)
    b, n, k = 32, 400, 10
    for f in (1, 5, 33):
        for trial in range(3):
            # quantized scores force ties to exercise tie-order parity
            scores = jnp.asarray(
                np.round(rng.standard_normal((b, n)) * 3).astype(np.float32)
            )
            filt = rng.integers(0, n, (b, f)).astype(np.int32)
            filt[rng.random((b, f)) < 0.3] = n  # padding slots
            filt = jnp.asarray(filt)
            rv, ri = masked_topk(scores, filt, k, strategy="scatter")
            for strat in ("compare", "fixup"):
                fv, fi = masked_topk(scores, filt, k, strategy=strat)
                np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))
                np.testing.assert_allclose(np.asarray(fv), np.asarray(rv))


def test_evaluate_embeddings_two_tier_widths():
    """Users above the compare-mask crossover route through the
    wide/scatter tier; metric must match a per-user numpy reference
    regardless of how users are regrouped (two-tier batching)."""
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.ops.topk import compare_max_f
    from gcn_recommendation_tpu.train.evaluate import evaluate_embeddings

    rng = np.random.default_rng(3)
    nu, ni, d, k = 6, 3000, 8, 5
    fcap = compare_max_f(ni)
    assert fcap < ni  # the wide tier must be reachable at this size
    fu = rng.standard_normal((nu, d)).astype(np.float32)
    fi = rng.standard_normal((ni, d)).astype(np.float32)

    tr_u, tr_i = [], []
    for u in range(nu):
        n_seen = fcap + 50 if u == 0 else 3  # user 0: wide tier
        items = rng.choice(ni, size=n_seen, replace=False)
        tr_u.extend([u] * n_seen)
        tr_i.extend(items.tolist())
    train = Interactions(
        np.asarray(tr_u, np.int32), np.asarray(tr_i, np.int32)
    )
    seen = {}
    for u, i in zip(train.user_idx, train.item_idx):
        seen.setdefault(int(u), []).append(int(i))

    # even users' held-out item is their best *unseen* item (guaranteed
    # hit at rank 0), odd users random — so the assertion checks ranking,
    # not just agreement on zero hits
    val_items = []
    for u in range(nu):
        if u % 2 == 0:
            s = fu[u] @ fi.T
            s[seen[u]] = -np.inf
            val_items.append(int(np.argmax(s)))
        else:
            val_items.append(int(rng.integers(0, ni)))
    val = Interactions(
        np.arange(nu, dtype=np.int32), np.asarray(val_items, np.int32)
    )

    recall, ndcg = evaluate_embeddings(
        jnp.asarray(fu), jnp.asarray(fi), val, train, nu, ni, k, batch_size=4
    )

    recalls, ndcgs = [], []
    for u in range(nu):
        s = fu[u] @ fi.T
        s[seen[u]] = -1e10
        top = np.argsort(-s, kind="stable")[:k]
        t = int(val.item_idx[u])
        hit = t in top
        recalls.append(float(hit))
        ndcgs.append(1.0 / np.log2(int(np.where(top == t)[0][0]) + 2) if hit else 0.0)
    np.testing.assert_allclose(recall, np.mean(recalls), rtol=1e-6)
    np.testing.assert_allclose(ndcg, np.mean(ndcgs), rtol=1e-5)


def test_eval_batches_multi_tier_ladder():
    """Heavy users ladder into geometric width tiers instead of one
    global-max wide tier; the metric must still match a per-user numpy
    reference, and no tier's filter width may pad to the global max."""
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.ops.topk import compare_max_f
    from gcn_recommendation_tpu.train.evaluate import (
        build_eval_batches,
        evaluate_batches,
    )

    rng = np.random.default_rng(7)
    nu, ni, d, k = 9, 3000, 8, 5
    c0 = compare_max_f(ni)
    # 3 users per tier: compare tier, one mid scatter tier, the top tier
    degs = [3, 3, 3, c0 + 40, c0 + 50, c0 + 60, 1500, 1600, 1700]
    fu = rng.standard_normal((nu, d)).astype(np.float32)
    fi = rng.standard_normal((ni, d)).astype(np.float32)

    tr_u, tr_i = [], []
    for u, n_seen in enumerate(degs):
        items = rng.choice(ni, size=n_seen, replace=False)
        tr_u.extend([u] * n_seen)
        tr_i.extend(items.tolist())
    train = Interactions(np.asarray(tr_u, np.int32), np.asarray(tr_i, np.int32))
    val = Interactions(
        np.arange(nu, dtype=np.int32),
        np.asarray([int(rng.integers(0, ni)) for _ in range(nu)], np.int32),
    )

    batches = build_eval_batches(val, train, nu, ni, batch_size=2)
    assert len(batches) >= 3  # ladder actually split the users
    widths = sorted(b[2].shape[-1] for b in batches)
    assert widths[0] <= c0            # compare tier stayed narrow
    assert widths[-2] < max(degs)     # mid tiers don't pad to the global max
    total_rows = sum(int(np.asarray(b[3]).sum()) for b in batches)
    assert total_rows == nu           # every user evaluated exactly once

    recall, ndcg = evaluate_batches(jnp.asarray(fu), jnp.asarray(fi), batches, k)

    seen = {}
    for u, i in zip(train.user_idx, train.item_idx):
        seen.setdefault(int(u), []).append(int(i))
    recalls, ndcgs = [], []
    for u in range(nu):
        s = fu[u] @ fi.T
        s[seen[u]] = -1e10
        top = np.argsort(-s, kind="stable")[:k]
        t = int(val.item_idx[u])
        hit = t in top
        recalls.append(float(hit))
        ndcgs.append(1.0 / np.log2(int(np.where(top == t)[0][0]) + 2) if hit else 0.0)
    np.testing.assert_allclose(recall, np.mean(recalls), rtol=1e-6)
    np.testing.assert_allclose(ndcg, np.mean(ndcgs), rtol=1e-5)
