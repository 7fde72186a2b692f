"""Stress test: north-star-scale graph on one chip (10x the bench graph).

500k users / 200k items / 20k brands, mean degree ~30 -> ~15M train
interactions, ~31M-entry normalized adjacency.  Validates that the whole
pipeline (ETL, bucketing, device transfer through the axon tunnel,
epoch-scan training, full-catalog eval) holds up at production scale on
a single v5e, and records throughput for PERF.md.

Run on the TPU host:  python tools/exp_scale.py [--dim D] [--layers K]
(defaults dim-64 x 3 layers; --dim 256 --layers 4 is the north-star
scaled config, BASELINE.json configs[4])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_USERS = 500_000
NUM_ITEMS = 200_000
NUM_BRANDS = 20_000
MEAN_DEGREE = 30.0
BATCH = 2048
STEPS = 20


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--eval_batch", type=int, default=None,
                    help="override eval_user_batch (default 1024)")
    ap.add_argument("--chunks", type=int, default=None,
                    help="override graph chunking: 0 = plain layout, "
                         "N = force N source chunks; default = auto rule")
    ap.add_argument("--compute_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="propagation storage dtype (the tile-model knee "
                         "halves the chunk count under bfloat16)")
    cli = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    t0 = time.perf_counter()
    bundle = synthetic_bundle(
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE,
        core=8,
        seed=42,
    )
    etl_s = time.perf_counter() - t0
    g = bundle.graph
    padded = sum(b.nbr_idx.size for b in g.buckets)
    print(
        f"ETL {etl_s:.0f}s: train={len(bundle.train):,} nnz={g.nnz:,} "
        f"buckets={len(g.buckets)} padded_rows={padded:,} "
        f"hubs={len(g.dense_node_ids)} dense={g.dense_mat.nbytes/1e6:,.0f}MB",
        flush=True,
    )

    cfg = Config(batch_size=BATCH, embedding_dim=cli.dim, n_layers=cli.layers,
                 compute_dtype=cli.compute_dtype)
    if cli.eval_batch:
        cfg.eval_user_batch = cli.eval_batch
    print(f"config: dim={cli.dim} layers={cli.layers} chunks={cli.chunks} "
          f"dtype={cli.compute_dtype}", flush=True)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    t0 = time.perf_counter()
    if cli.chunks is not None:
        # override the auto-chunk rule for A/B measurement
        if cli.chunks == 0:
            Trainer.graph_chunking = False
        else:
            import gcn_recommendation_tpu.train.trainer as _tr
            _tr.num_chunks_for = lambda n, d=64, ct=None: cli.chunks
    trainer = Trainer(cfg, model, bundle)
    trainer.steps_per_epoch = STEPS
    trainer._epoch_fn_jit = trainer._build_epoch_fn()
    params, opt = trainer.init_state(jax.random.PRNGKey(0))
    print(f"device setup {time.perf_counter() - t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    params, opt, losses = trainer._epoch_fn(params, opt, jax.random.PRNGKey(1))
    np.asarray(losses)
    print(f"compile+first scan {time.perf_counter() - t0:.0f}s", flush=True)

    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        params, opt, losses = trainer._epoch_fn(params, opt, jax.random.PRNGKey(2 + r))
        l = np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(l).all()
    step = best / STEPS
    edges_per_s = 2 * cli.layers * g.nnz / step  # K fwd + K bwd propagations
    print(
        f"train: {step*1e3:.1f} ms/step  {BATCH/step:,.0f} ex/s  "
        f"({edges_per_s/1e9:.2f}B edge-ops/s)",
        flush=True,
    )

    # full-catalog eval QPS at 200k items
    t0 = time.perf_counter()
    recall, ndcg = trainer.validate(params)
    dt = time.perf_counter() - t0
    n_eval = len(np.unique(bundle.val.user_idx))
    print(
        f"eval: {n_eval:,} users x {NUM_ITEMS:,} items in {dt:.1f}s "
        f"({n_eval/dt:,.0f} users/s incl. one-time batch build) "
        f"recall={recall:.4f}",
        flush=True,
    )
    t0 = time.perf_counter()
    recall, ndcg = trainer.validate(params)
    dt = time.perf_counter() - t0
    print(f"eval (cached batches): {n_eval/dt:,.0f} users/s", flush=True)


if __name__ == "__main__":
    main()
