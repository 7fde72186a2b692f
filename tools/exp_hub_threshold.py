"""Experiment: hub densification threshold sweep on the real TPU.

The dense hub path ([H, N] f32 @ [N, d] MXU matmul) absorbs power-law
destination rows.  XLA's matmul bandwidth is shape-sensitive — measured
252 GB/s at H=384 but 439 GB/s at H=1024 — so a lower threshold (more
hub rows) both removes gather rows *and* runs the dense read closer to
HBM speed.  This sweeps dense_threshold and times one full propagation
(fwd and fwd+bwd through the production custom-VJP kernel).

Run on the TPU host:  python tools/exp_hub_threshold.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHAIN = 30


def main():
    import jax
    import jax.numpy as jnp

    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.graph.build import build_normalized_adjacency
    from gcn_recommendation_tpu.ops.spmm import propagate_ell, to_device_graph

    bundle = synthetic_bundle(
        num_users=50_000, num_items=20_000, num_brands=2_000,
        mean_degree=28.0, core=8, seed=42,
    )
    tr = bundle.train
    ib = bundle.item_brand

    rng = np.random.default_rng(0)

    for thresh in (512, 320, 256, 192, 128, 96):
        g = build_normalized_adjacency(
            tr.user_idx, tr.item_idx,
            bundle.num_users, bundle.num_items, bundle.num_brands,
            item_brand_item_idx=ib.item_idx, item_brand_brand_idx=ib.brand_idx,
            dense_threshold=thresh,
        )
        dg = to_device_graph(g)
        n = g.num_nodes
        emb = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32) * 0.1)
        padded = sum(b.nbr_idx.size for b in g.buckets)
        h = len(g.dense_node_ids)

        @jax.jit
        def fwd(emb, bidx, bw, gidx, dmat):
            def body(e, _):
                return propagate_ell(e, bidx, bw, gidx, dmat), None
            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        @jax.jit
        def fwdbwd(emb, bidx, bw, gidx, dmat):
            def loss(e):
                return jnp.sum(propagate_ell(e, bidx, bw, gidx, dmat) ** 2)
            def body(e, _):
                return e - 1e-3 * jax.grad(loss)(e), None
            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        args = (dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat)
        res = {}
        for tag, f in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            _ = float(f(emb, *args))
            best = 1e9
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(f(emb, *args))
                best = min(best, time.perf_counter() - t0)
            res[tag] = best / CHAIN * 1e3
        print(
            f"thresh={thresh:4d}: H={h:5d} dense={h * n * 4 / 1e6:6.0f}MB "
            f"padded_rows={padded / 1e6:.2f}M buckets={len(g.buckets):2d} "
            f"fwd={res['fwd']:5.2f}ms fwd+bwd={res['fwd+bwd']:6.2f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
