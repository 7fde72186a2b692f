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


def hub_split_stats(u, i, nu, ni, hub_threshold=512):
    """Round-4 partition model: hub-destination edges go to the dense
    path; only non-hub edges are candidates for tiling.  Report tile
    coverage of the NON-HUB edges after degree sorting (the round-5
    decision rule: wire the Pallas path only if >60% of non-hub edges
    land in break-even tiles — VERDICT.md r4 #6)."""
    di = np.bincount(i, minlength=ni)
    hub = di[i] >= hub_threshold
    frac_hub = hub.mean()
    uu, ii = u[~hub], i[~hub]
    print(f"  hub edges (item deg>={hub_threshold}): {frac_hub*100:.1f}%",
          flush=True)
    du = np.bincount(uu, minlength=nu)
    dii = np.bincount(ii, minlength=ni)
    pu = np.empty(nu, np.int64); pu[np.argsort(-du)] = np.arange(nu)
    pi = np.empty(ni, np.int64); pi[np.argsort(-dii)] = np.arange(ni)
    tile_stats(pu[uu], pi[ii], nu, ni, "  non-hub deg-sorted")


def pair_coverage(u, i, nu, ni, sample_per_user=32, seed=0):
    """Greedy co-occurrence pair packing coverage (PERF.md 'co-occurrence
    pair packing'): fraction of edges (u, i) whose item's matched partner
    ALSO appears in u's list — each such pair of edges could be served by
    one gathered [128]-lane paired row instead of two.  ~20% coverage is
    the break-even from the round-3 study; the round-4 bench graphs
    measured 3-7%."""
    rng = np.random.default_rng(seed)
    order = np.argsort(u, kind="stable")
    us, isrt = u[order], i[order]
    starts = np.searchsorted(us, np.arange(nu))
    ends = np.searchsorted(us, np.arange(nu) + 1)
    # co-occurrence counts on a per-user sample (hub users capped),
    # vectorized: emit all within-user pair keys, then unique+count
    keys = []
    tri = np.triu_indices(sample_per_user, k=1)
    for a, b in zip(starts, ends):
        row = isrt[a:b]
        if len(row) > sample_per_user:
            row = rng.choice(row, sample_per_user, replace=False)
        row = np.sort(row)
        n = len(row)
        if n < 2:
            continue
        x, y = tri
        m = y < n
        keys.append(row[x[m]].astype(np.int64) * ni + row[y[m]])
    allk = np.concatenate(keys)
    uk, cnt = np.unique(allk, return_counts=True)
    srt = np.argsort(-cnt)
    # greedy disjoint matching by count
    partner = np.full(ni, -1, np.int64)
    for k in uk[srt]:
        a, b = int(k // ni), int(k % ni)
        if partner[a] < 0 and partner[b] < 0:
            partner[a] = b
            partner[b] = a
    # true coverage over ALL edges: edge (u,i) covered iff partner[i]
    # is also one of u's items
    covered = 0
    for a, b in zip(starts, ends):
        row = isrt[a:b]
        p = partner[row]
        ok = p >= 0
        if ok.any():
            covered += int(np.isin(p[ok], row).sum())
    print(f"  pair-packing coverage: {covered / len(u) * 100:.1f}% of edges "
          f"(break-even ~20%)", flush=True)


def main():
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle

    # 'heavy' = the round-5 curve-shape generator (exact-Zipf popularity,
    # heavy user-degree tail, spectrum-tailed factors — the books-regime
    # knobs of tools/calibrate_regimes.py) at bench scale: the round-4
    # rejections of block-sparse/pair-packing carried the caveat
    # "revisit on data with stronger co-clustering", which these graphs
    # are the framework's closest analogue of.
    for style in ("popularity", "latent", "heavy"):
        print(f"--- {style} graph (bench scale) ---", flush=True)
        kw = {}
        if style == "heavy":
            kw = dict(style="latent", pop_zipf=0.6, deg_sigma=1.0,
                      spectrum=1.0, split="rank", rank_key="taste")
        else:
            kw = dict(style=style)
        bundle = synthetic_bundle(
            num_users=50_000, num_items=20_000, num_brands=2_000,
            mean_degree=28.0, core=8, seed=42, **kw,
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

        hub_split_stats(u, i, nu, ni)
        pair_coverage(u, i, nu, ni)


if __name__ == "__main__":
    main()
