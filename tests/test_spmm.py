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
    from helpers import dense_from_graph

    return g, dense_from_graph(g)


def test_coo_path_matches_dense(graph_and_dense):
    g, dense = graph_and_dense
    n = g.num_nodes
    emb = np.random.default_rng(0).standard_normal((n, 16)).astype(np.float32)
    dg = to_device_graph(g, include_coo=True)
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
    dg = to_device_graph(g, include_coo=True)
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


def test_coo_excluded_by_default():
    """The hot path never needs the COO view on device; to_device_graph
    omits it (12 bytes/edge of HBM) unless include_coo=True, and the coo
    propagator fails loudly without it."""
    import pytest

    from gcn_recommendation_tpu.graph.build import build_normalized_adjacency

    rng = np.random.default_rng(5)
    g = build_normalized_adjacency(
        rng.integers(0, 20, 100), rng.integers(0, 15, 100), 20, 15, 2,
        use_brand=False,
    )
    dg = to_device_graph(g)
    assert dg.src.shape == (0,) and dg.weight.shape == (0,)
    with pytest.raises(ValueError, match="include_coo"):
        propagate(jnp.zeros((g.num_nodes, 4)), dg, g.num_nodes, path="coo")


@pytest.mark.parametrize(
    "num_chunks",
    [
        3,
        # other chunk counts are compile-heavy duplicates of the same math
        # (the dispatch/trainer tests already cover 3 and 4); keep them in
        # the full (-m "") suite only
        pytest.param(2, marks=pytest.mark.slow),
        pytest.param(5, marks=pytest.mark.slow),
    ],
)
def test_chunked_matvec_matches_plain(graph_and_dense, num_chunks):
    """Source-chunked ELL (gather-knee path) must equal the plain ELL and
    the dense reference exactly in math (float-order tolerances only),
    including hub-dense rows and gradients."""
    from gcn_recommendation_tpu.ops.spmm import (
        propagate_chunked,
        to_device_chunked_graph,
    )

    g, dense = graph_and_dense
    n = g.num_nodes
    emb = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)).astype(np.float32)
    )
    cdg = to_device_chunked_graph(g, num_chunks)

    def run(e):
        return propagate_chunked(
            e,
            cdg.chunk_bucket_idx,
            cdg.chunk_bucket_w,
            cdg.chunk_gather_idx,
            cdg.dense_mat,
            cdg.dense_gather_idx,
        )

    out = run(emb)
    np.testing.assert_allclose(
        np.asarray(out), dense @ np.asarray(emb), rtol=3e-5, atol=3e-5
    )
    # gradient: d/de sum(A e * t) = A^T t = A t (symmetric)
    t = jnp.asarray(
        np.random.default_rng(8).standard_normal((n, 16)).astype(np.float32)
    )
    grad = jax.grad(lambda e: jnp.sum(run(e) * t))(emb)
    np.testing.assert_allclose(
        np.asarray(grad), dense.T @ np.asarray(t), rtol=3e-5, atol=3e-5
    )


def test_chunked_propagate_dispatch(graph_and_dense):
    from gcn_recommendation_tpu.ops.spmm import to_device_chunked_graph

    g, dense = graph_and_dense
    n = g.num_nodes
    emb = jnp.asarray(
        np.random.default_rng(9).standard_normal((n, 8)).astype(np.float32)
    )
    cdg = to_device_chunked_graph(g, 4)
    out = jax.jit(lambda e: propagate(e, cdg, n))(emb)
    np.testing.assert_allclose(
        np.asarray(out), dense @ np.asarray(emb), rtol=3e-5, atol=3e-5
    )


def test_trainer_chunked_graph_equivalent(tiny_bundle):
    """A Trainer running on the chunked graph must produce (numerically)
    the same epoch losses as the plain layout."""
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.ops.spmm import to_device_chunked_graph
    from gcn_recommendation_tpu.train.trainer import Trainer

    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=8, n_layers=2, epochs=1, batch_size=64)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    tr = Trainer(cfg, model, bundle)
    params, opt = tr.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    _, _, losses_plain = tr._epoch_fn(params, opt, key)

    tr2 = Trainer(cfg, model, bundle)
    tr2.arrays = tr2.arrays._replace(
        graph=to_device_chunked_graph(bundle.graph, 3)
    )
    tr2._epoch_fn_jit = tr2._build_epoch_fn()
    params2, opt2 = tr2.init_state(jax.random.PRNGKey(0))
    _, _, losses_chunked = tr2._epoch_fn(params2, opt2, key)
    np.testing.assert_allclose(
        np.asarray(losses_plain), np.asarray(losses_chunked), rtol=2e-5
    )


def test_trainer_auto_chunking_trigger(tiny_bundle, monkeypatch):
    """Trainer must auto-select the chunked graph past the gather knee
    (knee lowered via monkeypatch so the tiny CI graph crosses it), and
    produce the same losses as the plain layout."""
    import gcn_recommendation_tpu.ops.spmm as spmm
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.ops.spmm import ChunkedDeviceGraph
    from gcn_recommendation_tpu.train.trainer import Trainer

    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=8, n_layers=2, epochs=1, batch_size=64)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    tr_plain = Trainer(cfg, model, bundle)
    assert not isinstance(tr_plain.arrays.graph, ChunkedDeviceGraph)

    monkeypatch.setattr(
        spmm, "GATHER_KNEE_ROWS", bundle.graph.num_nodes // 3
    )
    tr_auto = Trainer(cfg, model, bundle)
    assert isinstance(tr_auto.arrays.graph, ChunkedDeviceGraph)
    assert len(tr_auto.arrays.graph.chunk_gather_idx) >= 3

    params, opt = tr_plain.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    _, _, l_plain = tr_plain._epoch_fn(params, opt, key)
    params2, opt2 = tr_auto.init_state(jax.random.PRNGKey(0))
    _, _, l_auto = tr_auto._epoch_fn(params2, opt2, key)
    np.testing.assert_allclose(np.asarray(l_plain), np.asarray(l_auto), rtol=2e-5)


def test_chunked_matvec_bf16_f32_accumulation(graph_and_dense):
    """bf16 storage through the chunked path: partial sums accumulate in
    f32 (review finding — a bf16 acc would round each row C+1 times),
    so the result stays within one-rounding distance of the f32 path."""
    from gcn_recommendation_tpu.ops.spmm import (
        propagate_chunked,
        to_device_chunked_graph,
    )

    g, dense = graph_and_dense
    n = g.num_nodes
    emb32 = np.random.default_rng(11).standard_normal((n, 16)).astype(np.float32)
    cdg16 = to_device_chunked_graph(g, 4, compute_dtype=jnp.bfloat16)

    out = propagate_chunked(
        jnp.asarray(emb32).astype(jnp.bfloat16),
        cdg16.chunk_bucket_idx,
        cdg16.chunk_bucket_w,
        cdg16.chunk_gather_idx,
        cdg16.dense_mat,
        cdg16.dense_gather_idx,
    )
    assert out.dtype == jnp.bfloat16
    ref = dense @ emb32
    scale = np.abs(ref).max()
    # one bf16 rounding of inputs+output: ~2^-8 relative; C+1 roundings
    # would push past this bound on 16-wide rows
    assert np.abs(np.asarray(out, np.float32) - ref).max() < 2e-2 * scale


def test_chunked_build_more_slices_than_rows():
    """Trailing destination slices can be empty when the slice count
    over-divides a tiny node space ((S-1)*ceil(n/S) >= n); the builder
    must clamp them to zero rows, and propagation must still match."""
    import jax.numpy as jnp

    from gcn_recommendation_tpu.graph.build import build_normalized_adjacency
    from gcn_recommendation_tpu.ops.spmm import (
        propagate,
        to_device_chunked_graph,
        to_device_graph,
    )

    # 3 users + 2 items + 1 brand = 6 nodes; 4 chunks -> slice_rows=2,
    # slice 3 would span rows [6, 8) = empty
    g = build_normalized_adjacency(
        np.asarray([0, 1, 2, 0], np.int64),
        np.asarray([0, 1, 0, 1], np.int64),
        3, 2, 1,
        item_brand_item_idx=np.asarray([0], np.int64),
        item_brand_brand_idx=np.asarray([0], np.int64),
        use_brand=True,
    )
    emb = jnp.asarray(np.random.default_rng(0).standard_normal((6, 8)).astype(np.float32))
    plain = propagate(emb, to_device_graph(g), 6)
    chunked = propagate(emb, to_device_chunked_graph(g, 4), 6)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(plain), rtol=1e-5, atol=1e-6)


def test_to_device_graph_auto_knee_rule(graph_and_dense, monkeypatch):
    """Below the knee -> plain DeviceGraph; above -> ChunkedDeviceGraph."""
    from gcn_recommendation_tpu.ops import spmm
    from gcn_recommendation_tpu.ops.spmm import (
        ChunkedDeviceGraph,
        DeviceGraph,
        to_device_graph_auto,
    )

    g, _ = graph_and_dense
    assert isinstance(to_device_graph_auto(g), DeviceGraph)
    # real knees (180k rows at d<=128, 90k at d=256 — the tile model) are
    # far above this tiny graph at every dim
    assert isinstance(to_device_graph_auto(g, embedding_dim=256), DeviceGraph)
    monkeypatch.setattr(spmm, "GATHER_KNEE_ROWS", max(2, g.num_nodes // 2))
    assert isinstance(to_device_graph_auto(g), ChunkedDeviceGraph)
    # the knee is dim-aware via the tile model: at d=256 each row spans
    # two lane-tiles, so the same base constant halves and the wide graph
    # chunks ~2x deeper (measured 1.56x at stress scale —
    # tools/exp_dim_split.py, PERF.md)
    chunked_wide = to_device_graph_auto(g, embedding_dim=256)
    assert isinstance(chunked_wide, ChunkedDeviceGraph)
    assert len(chunked_wide.chunk_gather_idx) >= len(
        to_device_graph_auto(g).chunk_gather_idx
    )


def test_knee_rows_tile_model():
    """knee_rows_for implements the measured tile-count model: the fast
    gather region ends at ~22.5k (sublane x 128-lane) tiles — anchors
    f32 d<=128 -> 180k rows, f32 d=256 -> 90k, bf16 d=64 -> 360k
    (PERF.md gather-knee table)."""
    import jax.numpy as jnp

    from gcn_recommendation_tpu.ops.spmm import knee_rows_for, num_chunks_for

    assert knee_rows_for(64) == 180_000
    assert knee_rows_for(128) == 180_000
    assert knee_rows_for(256) == 90_000
    assert knee_rows_for(512) == 45_000
    assert knee_rows_for(64, jnp.bfloat16) == 360_000
    assert knee_rows_for(256, jnp.bfloat16) == 180_000
    # stress-scale configs: 720k nodes
    assert num_chunks_for(720_000, 64) == 4
    assert num_chunks_for(720_000, 256) == 8
    assert num_chunks_for(720_000, 64, jnp.bfloat16) == 2
    # bench scale never chunks at any dim
    assert num_chunks_for(72_000, 256) == 1


# ---------------------------------------------------------------------------
# Fused merge-skip propagation (propagate_sum_ell)
# ---------------------------------------------------------------------------


def test_propagate_sum_ell_matches_dense_powers(graph_and_dense):
    """The fused kernel computes sum_{k=1..K} A^k ego with ONE restore
    gather; check against dense matrix powers."""
    from gcn_recommendation_tpu.ops.spmm import propagate_sum_ell

    g, dense = graph_and_dense
    n = g.num_nodes
    emb = np.random.default_rng(3).standard_normal((n, 16)).astype(np.float32)
    dg = to_device_graph(g, fuse_layers=True)
    assert len(dg.bucket_nbr_idx_perm) == len(dg.bucket_nbr_idx)
    assert dg.dense_mat_perm is not None

    want = np.zeros_like(emb)
    x = emb
    for _ in range(3):
        x = dense @ x
        want = want + x
    got = propagate_sum_ell(
        3, jnp.asarray(emb), dg.bucket_nbr_idx, dg.bucket_nbr_w,
        dg.bucket_nbr_idx_perm, dg.gather_idx, dg.dense_mat,
        dg.dense_mat_perm,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-5, atol=5e-5)


def test_propagate_sum_ell_gradient_symmetric(graph_and_dense):
    """bwd = the same fused kernel on the cotangent (sum_k A^k symmetric)."""
    from gcn_recommendation_tpu.ops.spmm import propagate_sum_ell

    g, dense = graph_and_dense
    n = g.num_nodes
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    dg = to_device_graph(g, fuse_layers=True)

    def loss(e):
        out = propagate_sum_ell(
            2, e, dg.bucket_nbr_idx, dg.bucket_nbr_w,
            dg.bucket_nbr_idx_perm, dg.gather_idx, dg.dense_mat,
            dg.dense_mat_perm,
        )
        return jnp.sum(out * w)

    got = np.asarray(jax.grad(loss)(emb))
    m = dense + dense @ dense
    want = m.T @ np.asarray(w)  # = m @ w, m symmetric
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_model_apply_fused_matches_per_layer(tiny_bundle):
    """LightGCN.apply picks the fused path when the graph carries the
    permuted views; outputs must match the per-layer path."""
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model

    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=3)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    params = model.init(jax.random.PRNGKey(0))
    dg_fused = to_device_graph(bundle.graph, fuse_layers=True)
    dg_plain = to_device_graph(bundle.graph, fuse_layers=False)
    out_f = model.apply(params, dg_fused)
    out_p = model.apply(params, dg_plain)
    for a, b in zip(out_f, out_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
        )

    # gradients agree too (training-path equivalence)
    def loss_with(dg):
        def f(p):
            fu, fi, fb, u0, i0 = model.apply(p, dg)
            return (
                jnp.sum(fu[:4] * fi[:4]) + jnp.sum(fb) + 1e-3 * jnp.sum(u0 * u0)
            )
        return f

    gf = jax.grad(loss_with(dg_fused))(params)
    gp = jax.grad(loss_with(dg_plain))(params)
    for k in gf:
        np.testing.assert_allclose(
            np.asarray(gf[k]), np.asarray(gp[k]), rtol=2e-5, atol=2e-5
        )


def test_propagate_sum_ell_bf16_storage(graph_and_dense):
    """bf16 compute dtype: parts tables bf16, f32 layer accumulator —
    matches the f32 result within bf16 rounding."""
    from gcn_recommendation_tpu.ops.spmm import propagate_sum_ell

    g, dense = graph_and_dense
    n = g.num_nodes
    emb = np.random.default_rng(5).standard_normal((n, 8)).astype(np.float32)
    dg16 = to_device_graph(g, compute_dtype=jnp.bfloat16, fuse_layers=True)
    got = propagate_sum_ell(
        2, jnp.asarray(emb, jnp.bfloat16), dg16.bucket_nbr_idx,
        dg16.bucket_nbr_w, dg16.bucket_nbr_idx_perm, dg16.gather_idx,
        dg16.dense_mat, dg16.dense_mat_perm,
    )
    assert got.dtype == jnp.float32  # f32 accumulator out
    x = emb
    want = np.zeros_like(emb)
    for _ in range(2):
        x = dense @ x
        want = want + x
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.05, atol=0.05)
