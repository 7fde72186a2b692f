"""Attribute the bench-scale cold-compile cost (round-3 VERDICT #4).

``BENCH_r03.json`` reported ``train compile+first: 574.7s`` against a
cold persistent cache (r02's 11.4 s was warm, r01's 172.5 s predates
the merge-skip fused propagation).  This tool measures the epoch-fn
compile+first time at bench scale under a FRESH compilation-cache dir
(so the persistent cache neither helps nor is polluted), toggling the
single-device trainer's layout features:

* ``fused``    — merge-skip permuted-space views (Trainer default)
* ``per-layer``— plain per-layer propagation (fuse_layers=False)

Run on the TPU host:
    python tools/exp_compile_cost.py                 # both variants
    python tools/exp_compile_cost.py --variant fused
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# bench.py workload constants
NUM_USERS = 50_000
NUM_ITEMS = 20_000
NUM_BRANDS = 2_000
MEAN_DEGREE = 28.0
BATCH = 2048
DIM = 64
LAYERS = 3
SCAN_STEPS = 60


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["fused", "per-layer"], default=None)
    ap.add_argument("--keep_cache", action="store_true",
                    help="reuse the repo .jax_cache instead of a fresh dir "
                         "(measures the WARM path)")
    args = ap.parse_args()

    import jax

    if args.keep_cache:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    else:
        cache = tempfile.mkdtemp(prefix="jaxcache_cold_")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}  cache: {cache}")

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    bundle = synthetic_bundle(
        num_users=NUM_USERS, num_items=NUM_ITEMS, num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE, core=8, seed=42,
    )
    print(f"graph: nnz={bundle.graph.nnz} train={len(bundle.train)}")

    variants = [args.variant] if args.variant else ["fused", "per-layer"]
    for variant in variants:
        cfg = Config(embedding_dim=DIM, n_layers=LAYERS, batch_size=BATCH)
        model = get_model("LightGCN")(
            bundle.num_users, bundle.num_items, bundle.num_brands, cfg
        )

        class _T(Trainer):
            graph_fuse_layers = variant == "fused"

        t0 = time.perf_counter()
        tr = _T(cfg, model, bundle)
        tr.steps_per_epoch = SCAN_STEPS
        tr._epoch_fn_jit = tr._build_epoch_fn()
        build_s = time.perf_counter() - t0

        params, opt_state = tr.init_state(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        params, opt_state, losses = tr._epoch_fn(
            params, opt_state, jax.random.PRNGKey(1)
        )
        np.asarray(losses)
        first_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        params, opt_state, losses = tr._epoch_fn(
            params, opt_state, jax.random.PRNGKey(2)
        )
        np.asarray(losses)
        steady_s = time.perf_counter() - t0
        print(
            f"[{variant:9s}] host build {build_s:6.1f}s  "
            f"compile+first {first_s:6.1f}s  steady epoch {steady_s:6.2f}s "
            f"({SCAN_STEPS * BATCH / steady_s:,.0f} ex/s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
