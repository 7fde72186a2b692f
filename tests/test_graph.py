"""Graph construction & normalization vs. scipy ground truth.

The reference normalizes with scipy (main.py:321-331); these tests verify
our from-scratch construction (dedup-sum, D^-1/2 A D^-1/2, ELL bucketing)
reproduces the scipy result exactly on random heterogeneous graphs.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from gcn_recommendation_tpu.graph.build import (
    build_normalized_adjacency,
    normalize_sym,
)


def _scipy_norm_adj(u, i, bi, bb, nu, ni, nb, use_brand):
    """Reference formulation: scipy coo + D^-1/2 A D^-1/2 (main.py:300-331)."""
    item = i + nu
    n = nu + ni + nb
    if use_brand:
        rows = np.concatenate([u, item, bi + nu, bb + nu + ni])
        cols = np.concatenate([item, u, bb + nu + ni, bi + nu])
    else:
        rows = np.concatenate([u, item])
        cols = np.concatenate([item, u])
    adj = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n))
    rowsum = np.array(adj.sum(axis=1)).flatten()
    with np.errstate(divide="ignore"):
        dis = np.power(rowsum, -0.5)
    dis[np.isinf(dis)] = 0.0
    return sp.diags(dis).dot(adj).dot(sp.diags(dis)).tocsr()


def _random_graph(rng, nu=50, ni=40, nb=8, n_edges=400, n_ib=60):
    u = rng.integers(0, nu, n_edges)
    i = rng.integers(0, ni, n_edges)
    bi = rng.integers(0, ni, n_ib)
    bb = rng.integers(0, nb, n_ib)
    return u, i, bi, bb, nu, ni, nb


@pytest.mark.parametrize("use_brand", [True, False])
def test_normalized_weights_match_scipy(use_brand):
    rng = np.random.default_rng(1)
    u, i, bi, bb, nu, ni, nb = _random_graph(rng)
    g = build_normalized_adjacency(
        u, i, nu, ni, nb,
        item_brand_item_idx=bi, item_brand_brand_idx=bb,
        use_brand=use_brand, pad_multiple=64,
    )
    ref = _scipy_norm_adj(u, i, bi, bb, nu, ni, nb, use_brand)
    # rebuild dense from our COO view
    from helpers import dense_from_graph

    ours = dense_from_graph(g, np.float64)
    np.testing.assert_allclose(ours, ref.toarray(), rtol=1e-6, atol=1e-7)


def test_duplicate_edges_summed_like_coo_matrix():
    # duplicated (u, i) interaction -> adjacency entry 2 before normalization,
    # exactly like scipy coo_matrix dedup-sum (main.py:321)
    u = np.array([0, 0, 1])
    i = np.array([0, 0, 1])
    g = build_normalized_adjacency(u, i, 2, 2, 1, use_brand=False, pad_multiple=8)
    ref = _scipy_norm_adj(u, i, np.array([], int), np.array([], int), 2, 2, 1, False)
    from helpers import dense_from_graph

    ours = dense_from_graph(g, np.float64)
    np.testing.assert_allclose(ours, ref.toarray(), rtol=1e-6)


def test_isolated_brand_nodes_zero_degree():
    # use_brand=False keeps brand nodes allocated but isolated (main.py:287)
    rng = np.random.default_rng(2)
    u, i, bi, bb, nu, ni, nb = _random_graph(rng)
    g = build_normalized_adjacency(u, i, nu, ni, nb, use_brand=False)
    assert g.num_nodes == nu + ni + nb
    brand_rows = np.arange(nu + ni, nu + ni + nb)
    # no edges touch brand rows
    assert not np.isin(g.dst[: g.nnz], brand_rows).any()
    assert not np.isin(g.src[: g.nnz], brand_rows).any()


def test_ell_buckets_cover_all_edges():
    rng = np.random.default_rng(3)
    u, i, bi, bb, nu, ni, nb = _random_graph(rng)
    g = build_normalized_adjacency(
        u, i, nu, ni, nb, item_brand_item_idx=bi, item_brand_brand_idx=bb
    )
    total_entries = sum(int((b.nbr_w != 0).sum()) for b in g.buckets)
    total_entries += int((g.dense_mat != 0).sum())
    assert total_entries == (g.weight != 0).sum()
    # gather_idx is a valid permutation into concat(buckets)+zero row
    n_rows = sum(b.node_ids.shape[0] for b in g.buckets) + len(g.dense_node_ids)
    assert g.gather_idx.max() <= n_rows
    assert g.gather_idx.min() >= 0


def test_normalize_sym_isolated_inf_guard():
    rows = np.array([0, 1])
    cols = np.array([1, 0])
    vals = np.ones(2, np.float32)
    w = normalize_sym(rows, cols, vals, num_nodes=4)  # nodes 2,3 isolated
    assert np.isfinite(w).all()
    np.testing.assert_allclose(w, [1.0, 1.0])


def test_width_schedule_scalar_and_vectorized_agree():
    """default_width_schedule is the documented spec; bucket_by_degree
    uses width_schedule_vec — they must agree at every degree (incl. the
    1/2/4 colsum widths and all bucket boundaries)."""
    from gcn_recommendation_tpu.graph.build import (
        default_width_schedule,
        width_schedule_vec,
    )

    degs = np.concatenate([
        np.arange(1, 1100),
        np.array([1024, 1025, 2047, 2048, 2049, 4096, 4097, 8191, 8192]),
    ]).astype(np.int64)
    vec = width_schedule_vec(degs)
    scalar = np.array([default_width_schedule(int(d)) for d in degs])
    np.testing.assert_array_equal(vec, scalar)


def test_bucket_by_degree_zero_threshold_terminates_and_caps():
    """dense_threshold <= 0 ('densify everything') must terminate even
    when the dense block exceeds max_dense_bytes (regression: the budget
    loop doubled the threshold, and 0*2 == 0 looped forever)."""
    from gcn_recommendation_tpu.graph.build import bucket_by_degree

    rng = np.random.default_rng(0)
    n = 200
    dst = rng.integers(0, n, 2000).astype(np.int64)
    src = rng.integers(0, n, 2000).astype(np.int64)
    w = rng.random(2000).astype(np.float64)
    # budget allows only a handful of dense rows -> threshold must grow
    buckets, gidx, hub_ids, dense = bucket_by_degree(
        dst, src, w, n, dense_threshold=0, max_dense_bytes=n * 4 * 4
    )
    assert dense.shape[0] * n * 4 <= n * 4 * 4  # budget respected
    # coverage: every edge lands somewhere (dense + buckets) — duplicate
    # (dst, src) pairs collapse into one dense cell, so compare the
    # accumulated weight mass rather than nonzero counts
    mass = sum(float(b.nbr_w.sum()) for b in buckets) + float(dense.sum())
    np.testing.assert_allclose(mass, float(w.sum()), rtol=1e-6)


def test_pad_graph_nodes_propagation_unchanged():
    """pad_graph_nodes remaps node ids into a padded [U_pad|I_pad|B_pad]
    layout (tensor-parallel table padding); propagation over the padded
    graph must equal the dense ground truth on logical nodes, pad nodes
    must stay isolated (zero output), and bucket rows must come out
    evenly divisible by the requested multiple."""
    import jax.numpy as jnp

    from gcn_recommendation_tpu.graph.build import pad_graph_nodes
    from gcn_recommendation_tpu.ops.spmm import propagate, to_device_graph
    from helpers import dense_from_graph

    rng = np.random.default_rng(9)
    u, i, bi, bb, nu, ni, nb = _random_graph(rng, nu=49, ni=38, nb=7)
    g = build_normalized_adjacency(
        u, i, nu, ni, nb, item_brand_item_idx=bi, item_brand_brand_idx=bb
    )
    up, ip, bp = [-(-x // 4) * 4 for x in (nu, ni, nb)]
    assert (up, ip, bp) != (nu, ni, nb)  # padding must actually happen
    gp = pad_graph_nodes(g, up, ip, bp, bucket_row_multiple=4)
    assert gp.num_nodes == up + ip + bp
    for b in gp.buckets:
        assert b.nbr_idx.shape[0] % 4 == 0
    if len(gp.dense_node_ids):
        assert gp.dense_mat.shape[0] % 4 == 0

    dense = dense_from_graph(g)
    emb = rng.standard_normal((nu + ni + nb, 8)).astype(np.float32)
    # scatter logical rows into the padded layout (pad rows zero)
    emb_pad = np.zeros((gp.num_nodes, 8), np.float32)
    emb_pad[:nu] = emb[:nu]
    emb_pad[up : up + ni] = emb[nu : nu + ni]
    emb_pad[up + ip : up + ip + nb] = emb[nu + ni :]

    out = np.asarray(
        propagate(jnp.asarray(emb_pad), to_device_graph(gp), gp.num_nodes)
    )
    ref = dense @ emb
    np.testing.assert_allclose(out[:nu], ref[:nu], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[up : up + ni], ref[nu : nu + ni], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[up + ip : up + ip + nb], ref[nu + ni :], rtol=2e-5, atol=2e-5)
    # pad nodes are isolated -> propagate to exactly zero
    np.testing.assert_array_equal(out[nu:up], 0.0)
    np.testing.assert_array_equal(out[up + ni : up + ip], 0.0)
    np.testing.assert_array_equal(out[up + ip + nb :], 0.0)
