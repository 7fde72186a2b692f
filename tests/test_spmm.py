"""Propagation kernel tests: ELL and COO paths vs dense matmul ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_recommendation_tpu.graph.build import build_normalized_adjacency
from gcn_recommendation_tpu.ops.spmm import (
    propagate,
    propagate_coo,
    propagate_ell,
    to_device_graph,
)


@pytest.fixture(scope="module")
def graph_and_dense():
    rng = np.random.default_rng(7)
    nu, ni, nb = 60, 50, 10
    u = rng.integers(0, nu, 500)
    i = rng.integers(0, ni, 500)
    bi = rng.integers(0, ni, 80)
    bb = rng.integers(0, nb, 80)
    g = build_normalized_adjacency(
        u, i, nu, ni, nb, item_brand_item_idx=bi, item_brand_brand_idx=bb,
        pad_multiple=128,
    )
    n = g.num_nodes
    dense = np.zeros((n, n), np.float32)
    dense[g.dst, g.src] += g.weight
    return g, dense


def test_coo_path_matches_dense(graph_and_dense):
    g, dense = graph_and_dense
    n = g.num_nodes
    emb = np.random.default_rng(0).standard_normal((n, 16)).astype(np.float32)
    dg = to_device_graph(g)
    out = propagate_coo(jnp.asarray(emb), dg.src, dg.dst, dg.weight, n)
    np.testing.assert_allclose(np.asarray(out), dense @ emb, rtol=2e-5, atol=2e-5)


def test_ell_path_matches_dense(graph_and_dense):
    g, dense = graph_and_dense
    n = g.num_nodes
    emb = np.random.default_rng(1).standard_normal((n, 16)).astype(np.float32)
    dg = to_device_graph(g)
    out = propagate_ell(
        jnp.asarray(emb), dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx,
        dg.dense_mat,
    )
    np.testing.assert_allclose(np.asarray(out), dense @ emb, rtol=2e-5, atol=2e-5)


def test_ell_and_coo_agree_under_jit(graph_and_dense):
    g, _ = graph_and_dense
    n = g.num_nodes
    emb = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 8)).astype(np.float32)
    )
    dg = to_device_graph(g)
    f_ell = jax.jit(lambda e: propagate(e, dg, n, path="ell"))
    f_coo = jax.jit(lambda e: propagate(e, dg, n, path="coo"))
    np.testing.assert_allclose(
        np.asarray(f_ell(emb)), np.asarray(f_coo(emb)), rtol=2e-5, atol=2e-5
    )


def test_ell_gradient_is_symmetric_spmm(graph_and_dense):
    """The custom VJP uses A^T = A; check grads against the dense reference."""
    g, dense = graph_and_dense
    n = g.num_nodes
    dg = to_device_graph(g)
    emb = jnp.asarray(
        np.random.default_rng(3).standard_normal((n, 8)).astype(np.float32)
    )
    v = jnp.asarray(np.random.default_rng(4).standard_normal((n, 8)).astype(np.float32))

    def loss_ell(e):
        return jnp.sum(
            propagate_ell(
                e, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat
            )
            * v
        )

    grad = jax.grad(loss_ell)(emb)
    expected = dense.T @ np.asarray(v)
    np.testing.assert_allclose(np.asarray(grad), expected, rtol=2e-4, atol=2e-5)


def test_degree_zero_rows_are_zero():
    # isolated brand nodes must propagate to exactly zero
    u = np.array([0, 1])
    i = np.array([0, 1])
    g = build_normalized_adjacency(u, i, 2, 2, 3, use_brand=False, pad_multiple=8)
    dg = to_device_graph(g)
    emb = jnp.ones((g.num_nodes, 4), jnp.float32)
    out = propagate(emb, dg, g.num_nodes, path="ell")
    np.testing.assert_allclose(np.asarray(out[-3:]), 0.0)
