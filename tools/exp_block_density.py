"""Experiment: can graph reordering make a block-sparse MXU SpMM pay?

The gather path costs ~2.2 ns per (padded) neighbor row, locality-blind
(PERF.md).  A dense [128, 128] f32 adjacency tile costs ~64 KB of HBM
reads ≈ 78 ns at peak — break-even vs gathering when the tile holds
>= ~36 edges.  So the question is purely combinatorial: after the best
node reordering we can build offline, what fraction of edges lands in
128x128 tiles with >= 36 edges?

This is a host-side study (numpy/scipy, no TPU).  Orderings tried on the
user-item interaction matrix:

* random ids (baseline),
* degree-sorted (classic ELL-friendly order),
* co-clustering: truncated SVD of the interaction matrix -> k-means on
  user/item factors -> order by cluster id (the strongest cheap
  block-diagonalizer; upper-bounds what METIS-lite reordering would do).

Decision rule mirrors the pair-packing study: if even the co-clustered
order puts < ~20% of edges into break-even tiles, the block-sparse
formulation cannot beat the gather floor and is rejected with data.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TILE = 128
BREAK_EVEN_EDGES = 36


def tile_stats(u, i, nu, ni, name):
    """Fraction of edges in >=BREAK_EVEN_EDGES tiles of the U x I grid."""
    tu = u // TILE
    ti = i // TILE
    key = tu.astype(np.int64) * (-(-ni // TILE)) + ti
    counts = np.bincount(key)
    nz_tiles = counts[counts > 0]
    dense_edges = counts[counts >= BREAK_EVEN_EDGES].sum()
    frac = dense_edges / len(u)
    print(
        f"{name:14s} tiles>={BREAK_EVEN_EDGES}: {frac*100:5.1f}% of edges   "
        f"(nz tiles {len(nz_tiles):,}, mean fill {nz_tiles.mean():.2f}, "
        f"p99 {np.percentile(nz_tiles, 99):.0f})",
        flush=True,
    )
    return frac


def main():
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle

    for style in ("popularity", "latent"):
        print(f"--- {style} graph (bench scale) ---", flush=True)
        bundle = synthetic_bundle(
            num_users=50_000, num_items=20_000, num_brands=2_000,
            mean_degree=28.0, core=8, seed=42, style=style,
        )
        u = bundle.train.user_idx.astype(np.int64)
        i = bundle.train.item_idx.astype(np.int64)
        nu, ni = bundle.num_users, bundle.num_items

        tile_stats(u, i, nu, ni, "original")

        # degree-sorted
        du = np.bincount(u, minlength=nu)
        di = np.bincount(i, minlength=ni)
        pu = np.empty(nu, np.int64); pu[np.argsort(-du)] = np.arange(nu)
        pi = np.empty(ni, np.int64); pi[np.argsort(-di)] = np.arange(ni)
        tile_stats(pu[u], pi[i], nu, ni, "degree-sorted")

        # SVD co-clustering
        import scipy.sparse as sp
        from scipy.sparse.linalg import svds

        m = sp.coo_matrix((np.ones(len(u), np.float32), (u, i)), (nu, ni)).tocsr()
        # normalize rows a bit so hubs don't dominate the factors
        k = 16
        uf, s, vt = svds(m.astype(np.float32), k=k)
        rng = np.random.default_rng(0)

        def kmeans(x, n_clusters, iters=15):
            c = x[rng.choice(len(x), n_clusters, replace=False)]
            for _ in range(iters):
                d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1) if len(x) < 3000 else None
                if d is None:
                    # chunked assignment for big x
                    assign = np.empty(len(x), np.int64)
                    for lo in range(0, len(x), 4096):
                        xx = x[lo : lo + 4096]
                        dd = (xx**2).sum(1)[:, None] - 2 * xx @ c.T + (c**2).sum(1)[None]
                        assign[lo : lo + 4096] = dd.argmin(1)
                else:
                    assign = d.argmin(1)
                for j in range(n_clusters):
                    mask = assign == j
                    if mask.any():
                        c[j] = x[mask].mean(0)
            return assign

        cu = kmeans(uf * s[None, :] ** 0.5, max(2, nu // 2000))
        ci = kmeans((vt.T) * s[None, :] ** 0.5, max(2, ni // 1000))
        pu = np.argsort(np.argsort(cu * (nu + 1) + rng.random(nu)))
        # order: primary cluster id, ties random — use lexsort properly
        pu = np.empty(nu, np.int64); pu[np.lexsort((np.arange(nu), cu))] = np.arange(nu)
        pi = np.empty(ni, np.int64); pi[np.lexsort((np.arange(ni), ci))] = np.arange(ni)
        tile_stats(pu[u], pi[i], nu, ni, "co-clustered")


if __name__ == "__main__":
    main()
