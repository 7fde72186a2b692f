"""Benchmark: LightGCN training throughput (examples/sec/chip) + top-k QPS.

Workload: Amazon-Books-shaped synthetic graph (the reference publishes no
raw data and no throughput numbers — BASELINE.md), LightGCN dim-64,
3 layers, batch 2048, full-graph propagation per step exactly like the
reference hot loop (main.py:488-526).

Measurement methodology (axon TPU tunnel): ``block_until_ready`` does not
actually wait on this platform and per-call argument marshalling costs
~10ms, so the only honest measurement is the production path itself — a
whole epoch as one ``lax.scan`` on device, timed wall-clock from dispatch
to fetching the loss array.  Top-k QPS is likewise measured as a scanned
batch of eval queries per dispatch.

``vs_baseline`` is measured, not assumed: the same train step runs in a
faithful torch re-implementation of the reference (torch.sparse.mm COO
propagation + Adam, CPU — the only runnable reference equivalent in this
environment) on the same graph, and the ratio reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# benchmark scale (Amazon-Books 20-core shaped)
NUM_USERS = 50_000
NUM_ITEMS = 20_000
NUM_BRANDS = 2_000
MEAN_DEGREE = 28.0
BATCH = 2048
DIM = 64
LAYERS = 3
SCAN_STEPS = 60      # steps per timed dispatch
TIMED_REPS = 3
TORCH_STEPS = 5
TORCH_REPS = 3       # best-of-N medians — resilient to host-load noise
TORCH_THREADS = 2    # pinned: this host has 2 vCPUs; a floating thread
                     # count swung the baseline ~4x across rounds
# Recorded torch-CPU baseline for this exact workload under the pinned
# protocol above (measured 2026-08-21 on the round-4 host, best of 3
# medians).  ``vs_recorded_baseline`` uses this constant so the headline
# ratio is comparable across rounds even if the live baseline run hits
# background load; the live-measured ratio is still reported.
RECORDED_TORCH_BASELINE = 2054.0  # ex/s; quiet-host trials 1871/2054/2120
# (a concurrent TPU-grid host process depressed earlier trials to
# 1712/1786 — measure the comparator alone, like the serving numbers)


def build_bundle():
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle

    return synthetic_bundle(
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE,
        core=8,
        seed=42,
    )


def bench_jax(bundle):
    import jax

    # persistent compilation cache: repeated driver runs skip the (slow)
    # remote compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    cfg = Config(embedding_dim=DIM, n_layers=LAYERS, batch_size=BATCH)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    trainer = Trainer(cfg, model, bundle)
    # bound the scan length so each timed dispatch is ~2.5s
    trainer.steps_per_epoch = SCAN_STEPS
    trainer._epoch_fn_jit = trainer._build_epoch_fn()
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    params, opt_state, losses = trainer._epoch_fn(
        params, opt_state, jax.random.PRNGKey(1)
    )
    np.asarray(losses)  # forces completion (block_until_ready is unreliable)
    sys.stderr.write(f"train compile+first: {time.perf_counter() - t0:.1f}s\n")

    times = []
    for rep in range(TIMED_REPS):
        t0 = time.perf_counter()
        params, opt_state, losses = trainer._epoch_fn(
            params, opt_state, jax.random.PRNGKey(2 + rep)
        )
        l = np.asarray(losses)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(l).all()
    best = min(times)
    train_ex_per_s = SCAN_STEPS * BATCH / best

    # --- top-k QPS: scanned full-catalog eval queries ---
    fu, fi, *_ = model.apply(params, trainer.arrays.graph)
    rng = np.random.default_rng(0)
    n_batches = 20
    users_eval = jnp.asarray(
        rng.integers(0, bundle.num_users, (n_batches, 1024)).astype(np.int32)
    )
    from gcn_recommendation_tpu.ops.topk import masked_topk_scores


    @jax.jit
    def eval_scan(fu, fi, users):
        filt = jnp.full((1024, 8), fi.shape[0], dtype=jnp.int32)

        def body(carry, ub):
            u = jnp.take(fu, ub, axis=0)
            vals, idx = masked_topk_scores(u, fi, filt, 20)
            return carry + jnp.sum(idx[:, 0]).astype(jnp.int32), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), users)
        return out

    _ = int(eval_scan(fu, fi, users_eval))
    t0 = time.perf_counter()
    _ = int(eval_scan(fu, fi, users_eval))
    topk_qps = n_batches * 1024 / (time.perf_counter() - t0)

    # --- honest end-to-end evaluator: REAL per-user filter widths ---
    # (the number above is a near-unmasked upper bound: 8 pad-only filter
    # slots, no metric reduction).  This one is the production validate
    # path — tier-laddered masked top-k + hit/NDCG reduction over every
    # user's actual seen-set (main.py:415-426 semantics).
    from gcn_recommendation_tpu.ops.topk import topk_eval_scan
    from gcn_recommendation_tpu.train.evaluate import build_eval_batches

    batches = build_eval_batches(
        bundle.val, bundle.train, bundle.num_users, bundle.num_items, 1024
    )
    n_eval_users = sum(int(np.asarray(v).sum()) for *_, v in batches)

    def run_eval():
        tot = 0.0
        for bu, bt, filt, valid in batches:
            r, n, c = topk_eval_scan(fu, fi, bu, bt, filt, valid, 20)
            tot += float(c)  # scalar fetch forces completion per tier
        return tot

    assert int(run_eval()) == n_eval_users  # warm-up + sanity
    t0 = time.perf_counter()
    run_eval()
    eval_users_per_s = n_eval_users / (time.perf_counter() - t0)

    return train_ex_per_s, topk_qps, eval_users_per_s


def bench_torch_reference(bundle):
    """Reference-equivalent train step in torch (CPU): COO sparse.mm
    propagation x3, mean of layers, BPR + L2, Adam — the main.py hot loop.

    Protocol pinned for cross-round comparability (round-3 VERDICT #6):
    fixed thread count, ``TORCH_REPS`` independent repetitions, each
    scored by its median post-warmup step, best-of taken (least
    background interference)."""
    import torch

    torch.set_num_threads(TORCH_THREADS)
    g = bundle.graph
    n = g.num_nodes
    idx = torch.tensor(
        np.stack([g.dst[: g.nnz], g.src[: g.nnz]]).astype(np.int64)
    )
    vals = torch.tensor(g.weight[: g.nnz])
    adj = torch.sparse_coo_tensor(idx, vals, (n, n)).coalesce()

    emb = torch.nn.Parameter(torch.randn(n, DIM) * 0.01)
    opt = torch.optim.Adam([emb], lr=1e-3)
    rng = np.random.default_rng(0)
    nu, ni = bundle.num_users, bundle.num_items

    rep_rates = []
    for rep in range(TORCH_REPS):
        step_times = []
        for s in range(TORCH_STEPS + 1):  # first step warms allocator/caches
            b = rng.integers(0, len(bundle.train), BATCH)
            users = torch.tensor(bundle.train.user_idx[b].astype(np.int64))
            pos = torch.tensor(bundle.train.item_idx[b].astype(np.int64)) + nu
            neg = torch.tensor(rng.integers(0, ni, BATCH) + nu)
            t0 = time.perf_counter()
            opt.zero_grad()
            e = emb
            acc = emb
            for _ in range(LAYERS):
                e = torch.sparse.mm(adj, e)
                acc = acc + e
            final = acc / (LAYERS + 1)
            fu, fp, fn_ = final[users], final[pos], final[neg]
            bpr = -torch.mean(torch.log(torch.sigmoid((fu * fp).sum(1) - (fu * fn_).sum(1)) + 1e-8))
            reg = 1e-4 * (emb[users].norm(2).pow(2) + emb[pos].norm(2).pow(2) + emb[neg].norm(2).pow(2)) / BATCH
            (bpr + reg).backward()
            opt.step()
            step_times.append(time.perf_counter() - t0)
        # median step after warmup within the rep; best rep across reps
        rep_rates.append(BATCH / float(np.median(step_times[1:])))
    return max(rep_rates)


def main():
    bundle = build_bundle()
    sys.stderr.write(
        f"bench graph: users={bundle.num_users} items={bundle.num_items} "
        f"train={len(bundle.train)} nnz={bundle.graph.nnz}\n"
    )
    train_ex_per_s, topk_qps, eval_users_per_s = bench_jax(bundle)
    sys.stderr.write(
        f"jax train: {train_ex_per_s:,.0f} ex/s  topk (unmasked bound): "
        f"{topk_qps:,.0f} qps  masked eval: {eval_users_per_s:,.0f} users/s\n"
    )
    try:
        baseline = bench_torch_reference(bundle)
        sys.stderr.write(f"torch reference baseline: {baseline:,.0f} ex/s\n")
    except Exception as e:  # torch missing/failing should not kill the bench
        sys.stderr.write(f"torch baseline failed: {e}\n")
        baseline = None
    vs = (train_ex_per_s / baseline) if baseline else 1.0
    vs_recorded = (
        round(train_ex_per_s / RECORDED_TORCH_BASELINE, 3)
        if RECORDED_TORCH_BASELINE
        else None
    )
    print(
        json.dumps(
            {
                "metric": "lightgcn_train_throughput",
                "value": round(train_ex_per_s, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(vs, 3),
                # pinned-protocol comparators (round-3 VERDICT #6): the
                # live torch measurement under fixed threads/best-of-N,
                # plus the ratio against the recorded constant above
                "torch_baseline_ex_per_s": round(baseline, 1) if baseline else None,
                "vs_recorded_baseline": vs_recorded,
                # retrieval: the honest figure is the masked end-to-end
                # evaluator (real per-user filter widths + metric
                # reduction); the unmasked QPS is a kernel upper bound
                "eval_users_per_sec": round(eval_users_per_s, 1),
                "topk_qps_unmasked": round(topk_qps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
