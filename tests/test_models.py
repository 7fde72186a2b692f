"""Model forward parity vs. a dense-matmul reference of lightgcn.py:35-59."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.graph.build import build_normalized_adjacency
from gcn_recommendation_tpu.models import get_model
from gcn_recommendation_tpu.ops.spmm import to_device_graph


@pytest.fixture(scope="module")
def small_setup():
    rng = np.random.default_rng(11)
    nu, ni, nb = 40, 30, 6
    u = rng.integers(0, nu, 300)
    i = rng.integers(0, ni, 300)
    bi = rng.integers(0, ni, 40)
    bb = rng.integers(0, nb, 40)
    g = build_normalized_adjacency(
        u, i, nu, ni, nb, item_brand_item_idx=bi, item_brand_brand_idx=bb
    )
    from helpers import dense_from_graph

    dense = dense_from_graph(g)
    cfg = Config(embedding_dim=16, n_layers=3, debug=False)
    return g, dense, cfg, (nu, ni, nb)


def _dense_lightgcn_forward(dense, ego, n_layers):
    """mean over [e0, A e0, A^2 e0, ...] (lightgcn.py:41-54)"""
    outs = [ego]
    e = ego
    for _ in range(n_layers):
        e = dense @ e
        outs.append(e)
    return np.mean(np.stack(outs), axis=0)


def test_lightgcn_forward_matches_dense(small_setup):
    g, dense, cfg, (nu, ni, nb) = small_setup
    model = get_model("LightGCN")(nu, ni, nb, cfg)
    params = model.init(jax.random.PRNGKey(0))
    dg = to_device_graph(g)
    fu, fi, fb, u0, i0 = model.apply(params, dg)

    ego = np.concatenate(
        [np.asarray(params[k]) for k in ("user_embedding", "item_embedding", "brand_embedding")]
    )
    final = _dense_lightgcn_forward(dense, ego, cfg.n_layers)
    np.testing.assert_allclose(np.asarray(fu), final[:nu], rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(fi), final[nu : nu + ni], rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(fb), final[nu + ni :], rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(params["user_embedding"]))
    np.testing.assert_allclose(np.asarray(i0), np.asarray(params["item_embedding"]))


def test_lightgcn_pretrained_item_init(small_setup):
    g, dense, cfg, (nu, ni, nb) = small_setup
    pre = np.random.default_rng(5).standard_normal((ni, cfg.embedding_dim)).astype(
        np.float32
    )
    model = get_model("LightGCN")(nu, ni, nb, cfg, pretrained_item_emb=pre)
    params = model.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(params["item_embedding"]), pre)


def test_lightgcn_pretrained_dim_mismatch_raises(small_setup):
    g, dense, cfg, (nu, ni, nb) = small_setup
    pre = np.zeros((ni, cfg.embedding_dim + 1), np.float32)
    with pytest.raises(ValueError, match="does not match"):
        get_model("LightGCN")(nu, ni, nb, cfg, pretrained_item_emb=pre)


def test_fusion_requires_pretrained(small_setup):
    g, dense, cfg, (nu, ni, nb) = small_setup
    with pytest.raises(ValueError, match="requires pretrained"):
        get_model("LightGCN_Fusion")(nu, ni, nb, cfg)


def test_fusion_forward_matches_dense(small_setup):
    g, dense, cfg, (nu, ni, nb) = small_setup
    cdim = 24
    content = np.random.default_rng(6).standard_normal((ni, cdim)).astype(np.float32)
    model = get_model("LightGCN_Fusion")(nu, ni, nb, cfg, pretrained_item_emb=content)
    params = model.init(jax.random.PRNGKey(1))
    dg = to_device_graph(g)
    fu, fi, fb, u0, i0 = model.apply(params, dg)

    # dense reference of the fusion pre-step (lightgcn_fusion.py:45-52)
    combined = np.concatenate([np.asarray(params["item_embedding"]), content], axis=1)
    fused = combined @ np.asarray(params["fusion_kernel"]) + np.asarray(
        params["fusion_bias"]
    )
    fused = np.where(fused > 0, fused, 0.01 * fused)  # leaky_relu slope 0.01
    ego = np.concatenate(
        [np.asarray(params["user_embedding"]), fused, np.asarray(params["brand_embedding"])]
    )
    final = _dense_lightgcn_forward(dense, ego, cfg.n_layers)
    np.testing.assert_allclose(np.asarray(fu), final[:nu], rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(fi), final[nu : nu + ni], rtol=3e-5, atol=3e-6)
    # layer-0 item embedding for the regularizer is the ID table (:65)
    np.testing.assert_allclose(np.asarray(i0), np.asarray(params["item_embedding"]))


def test_registry_unknown_model_raises():
    with pytest.raises(ImportError):
        get_model("NoSuchModel")


def test_xavier_init_statistics():
    from gcn_recommendation_tpu.models.lightgcn import xavier_uniform

    w = xavier_uniform(jax.random.PRNGKey(0), (4000, 64))
    bound = np.sqrt(6.0 / (4000 + 64))
    assert float(jnp.max(jnp.abs(w))) <= bound + 1e-6
    assert float(jnp.std(w)) == pytest.approx(bound / np.sqrt(3), rel=0.05)


def test_lightgcn_bf16_compute_mode(small_setup):
    """bf16 storage / f32 accumulate: f32 outputs, close to the f32 path,
    finite gradients (ROADMAP bf16 mode; ops/spmm.py f32 accumulators)."""
    import dataclasses

    g, dense, cfg, (nu, ni, nb) = small_setup
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    model = get_model("LightGCN")(nu, ni, nb, cfg16)
    params = model.init(jax.random.PRNGKey(0))

    dg16 = to_device_graph(g, compute_dtype=jnp.bfloat16)
    fu16, fi16, fb16, *_ = model.apply(params, dg16)
    assert fu16.dtype == jnp.float32  # outputs stay f32 for loss/top-k

    model32 = get_model("LightGCN")(nu, ni, nb, cfg)
    fu32, fi32, *_ = model32.apply(params, to_device_graph(g))
    scale = float(jnp.max(jnp.abs(fu32)))
    assert float(jnp.max(jnp.abs(fu16 - fu32))) < 2e-2 * scale

    def loss(p):
        fu, fi, *_ = model.apply(p, dg16)
        return jnp.sum(fu**2) + jnp.sum(fi**2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.isfinite(leaf).all())
        assert leaf.dtype == jnp.float32  # param grads stay f32 for Adam


def test_fusion_id_init_variant(small_setup):
    """`fusemb` grid variant: the trainable item ID table is initialized
    from the pretrained matrix (the commented-out from_pretrained
    alternative at reference lightgcn_fusion.py:21) while the frozen
    content buffer stays; requires matching dims."""
    g, dense, cfg, (nu, ni, nb) = small_setup
    import dataclasses

    pre = np.random.default_rng(5).standard_normal(
        (ni, cfg.embedding_dim)
    ).astype(np.float32)
    cfg_id = dataclasses.replace(cfg, fusion_id_init=True)
    model = get_model("LightGCN_Fusion")(nu, ni, nb, cfg_id, pretrained_item_emb=pre)
    params = model.init(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(params["item_embedding"]), pre)
    np.testing.assert_array_equal(np.asarray(params["item_content_embedding"]), pre)

    # plain fus: ID table random, NOT the pretrained matrix
    model2 = get_model("LightGCN_Fusion")(nu, ni, nb, cfg, pretrained_item_emb=pre)
    params2 = model2.init(jax.random.PRNGKey(0))
    assert np.abs(np.asarray(params2["item_embedding"]) - pre).max() > 1e-3

    # dim mismatch raises
    bad = np.zeros((ni, cfg.embedding_dim + 3), np.float32)
    import pytest

    with pytest.raises(ValueError, match="fusion_id_init"):
        get_model("LightGCN_Fusion")(nu, ni, nb, cfg_id, pretrained_item_emb=bad)
