"""Experiment: SpMM formulation variants on the real TPU.

Compares the production per-bucket ELL matvec (one gather kernel per
degree bucket, 13-16 kernels) against a single *flat* gather over the
concatenated padded neighbor lists (one big gather + per-bucket
reshape-reductions).  Hypothesis: same gathered-row count, fewer kernels
=> lower dispatch/compile overhead; risk: the [R, d] flat intermediate
defeats XLA's gather+mul+reduce fusion and blows HBM traffic.

Timing per PERF.md: chain iterations through a data dependency inside one
scan dispatch, fetch one scalar (block_until_ready is a no-op on axon).

Run on the TPU host:  python tools/exp_spmm_variants.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_USERS = 50_000
NUM_ITEMS = 20_000
NUM_BRANDS = 2_000
MEAN_DEGREE = 28.0
DIM = 64
CHAIN = 30


def main():
    import jax
    import jax.numpy as jnp

    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.ops.spmm import to_device_graph

    bundle = synthetic_bundle(
        num_users=NUM_USERS,
        num_items=NUM_ITEMS,
        num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE,
        core=8,
        seed=42,
    )
    g = bundle.graph
    n = g.num_nodes
    dg = to_device_graph(g)
    print(
        f"graph: nodes={n} nnz={g.nnz} buckets={len(g.buckets)} "
        f"padded_rows={sum(b.nbr_idx.size for b in g.buckets)} "
        f"hubs={len(g.dense_node_ids)}",
        flush=True,
    )

    # ---- flat layout (host build) ----
    flat_idx = np.concatenate([b.nbr_idx.ravel() for b in g.buckets])
    flat_w = np.concatenate([b.nbr_w.ravel() for b in g.buckets])
    shapes = [(b.nbr_idx.shape[0], b.width) for b in g.buckets]
    offs = np.cumsum([0] + [nb * w for nb, w in shapes]).tolist()
    flat_idx_d = jnp.asarray(flat_idx)
    flat_w_d = jnp.asarray(flat_w)

    def matvec_bucketed(emb, bidx, bw, gidx, dmat):
        parts = []
        for idx, w in zip(bidx, bw):
            gathered = jnp.take(emb, idx, axis=0)
            parts.append(jnp.sum(gathered * w[..., None], axis=1))
        if dmat.shape[0]:
            parts.append(
                jnp.dot(dmat, emb, preferred_element_type=jnp.float32)
            )
        parts.append(jnp.zeros((1, emb.shape[1]), emb.dtype))
        return jnp.concatenate(parts, axis=0)[gidx]

    def matvec_flat(emb, fidx, fw, gidx, dmat):
        gathered = jnp.take(emb, fidx, axis=0) * fw[:, None]  # [R, d]
        parts = []
        for (nb, w), off in zip(shapes, offs):
            parts.append(gathered[off : off + nb * w].reshape(nb, w, -1).sum(1))
        if dmat.shape[0]:
            parts.append(
                jnp.dot(dmat, emb, preferred_element_type=jnp.float32)
            )
        parts.append(jnp.zeros((1, emb.shape[1]), emb.dtype))
        return jnp.concatenate(parts, axis=0)[gidx]

    rng = np.random.default_rng(0)
    emb0 = jnp.asarray(rng.standard_normal((n, DIM)).astype(np.float32) * 0.1)

    def time_variant(name, fn, *args):
        @jax.jit
        def fwd_chain(emb, *a):
            def body(e, _):
                return fn(e, *a), None
            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        @jax.jit
        def grad_chain(emb, *a):
            def loss(e):
                return jnp.sum(fn(e, *a) ** 2)
            def body(e, _):
                return e - 1e-3 * jax.grad(loss)(e), None
            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        for tag, chain in (("fwd", fwd_chain), ("fwd+bwd", grad_chain)):
            t0 = time.perf_counter()
            _ = float(chain(emb0, *args))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(chain(emb0, *args))
                best = min(best, time.perf_counter() - t0)
            print(
                f"{name:12s} {tag:8s} {best / CHAIN * 1e3:7.2f} ms/prop-step"
                f"   (compile+first {compile_s:.1f}s)",
                flush=True,
            )

    # numeric agreement first
    a = matvec_bucketed(emb0, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat)
    b = matvec_flat(emb0, flat_idx_d, flat_w_d, dg.gather_idx, dg.dense_mat)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max |bucketed - flat| = {err:.2e}", flush=True)
    assert err < 1e-4

    time_variant(
        "bucketed", matvec_bucketed, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat
    )
    time_variant("flat", matvec_flat, flat_idx_d, flat_w_d, dg.gather_idx, dg.dense_mat)


if __name__ == "__main__":
    main()
