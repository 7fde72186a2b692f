"""Experiment: Pallas tile partition vs plain ELL on the real TPU.

Round-4 rejected block-sparse MXU propagation at 40-47% non-hub tile
coverage; the round-5 heavy-tailed generator measures 65.4% at fill>=36
with row-only sorting (tools/exp_block_density.py), crossing the
wire-it threshold.  This measures the wired production path
(ops/block_spmm.py::propagate_ell_tiles) end-to-end against the plain
ELL propagation on the same graph, across min_fill and tile dtype —
the measured yes/no the round-4 verdict asked for.

Timing per PERF.md: chain propagation steps through a data dependency
inside one scan dispatch, fetch one scalar.

Run on the TPU host:  python tools/exp_tile_spmm.py
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

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.graph.tiles import partition_tiles
    from gcn_recommendation_tpu.ops.block_spmm import (
        propagate_ell_tiles,
        to_device_tiles,
    )
    from gcn_recommendation_tpu.ops.spmm import propagate_ell, to_device_graph

    print(f"devices: {jax.devices()}", flush=True)
    # the heavy-tailed bench graph (the round-5 generator regime)
    bundle = synthetic_bundle(
        num_users=NUM_USERS, num_items=NUM_ITEMS, num_brands=NUM_BRANDS,
        mean_degree=MEAN_DEGREE, core=8, seed=42, style="latent",
        pop_zipf=0.6, deg_sigma=1.0, spectrum=1.0, split="rank",
        rank_key="taste",
    )
    g = bundle.graph
    n = g.num_nodes
    print(f"graph: nodes={n} nnz={g.nnz:,} hubs={len(g.dense_node_ids)}",
          flush=True)

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

        out = {}
        for tag, chain in (("fwd", fwd_chain), ("fwd+bwd", grad_chain)):
            t0 = time.perf_counter()
            _ = float(chain(emb0, *args))
            compile_s = time.perf_counter() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(chain(emb0, *args))
                best = min(best, time.perf_counter() - t0)
            out[tag] = best / CHAIN * 1e3
            print(
                f"{name:26s} {tag:8s} {out[tag]:7.2f} ms/prop-step"
                f"   (compile+first {compile_s:.1f}s)",
                flush=True,
            )
        return out

    dg = to_device_graph(g, fuse_layers=False)
    baseline = time_variant(
        "ell (plain)",
        lambda e, bi, bw, gi, dm: propagate_ell(e, bi, bw, gi, dm),
        dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat,
    )

    ref = propagate_ell(
        emb0, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat
    )

    for min_fill in (64, 128):
        part = partition_tiles(g, min_fill=min_fill)
        if part is None:
            print(f"min_fill={min_fill}: no qualifying tiles", flush=True)
            continue
        cov = part.covered_edges / g.nnz * 100
        print(
            f"\nmin_fill={min_fill}: {part.num_tiles} tiles, "
            f"{part.covered_edges:,} edges covered ({cov:.1f}% of all), "
            f"{part.n_row_blocks} row blocks, "
            f"tile HBM {part.tile_a.nbytes / 1e6:.0f} MB f32",
            flush=True,
        )
        dres = to_device_graph(part.residual, fuse_layers=False)
        for dtype in (jnp.float32, jnp.bfloat16):
            tiles = to_device_tiles(part, tile_dtype=dtype)
            out = propagate_ell_tiles(emb0, dres, tiles)
            err = float(jnp.max(jnp.abs(out - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            print(f"  [{dtype.__name__}] max err vs ell: {err:.2e} "
                  f"(scale {scale:.2e})", flush=True)
            r = time_variant(
                f"tiles fill>={min_fill} {dtype.__name__}",
                lambda e, d_, t_: propagate_ell_tiles(e, d_, t_),
                dres, tiles,
            )
            for tag in r:
                speed = baseline[tag] / r[tag]
                print(f"    -> {tag}: {speed:.2f}x vs plain ELL", flush=True)


if __name__ == "__main__":
    main()
