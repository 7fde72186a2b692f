"""SPMD tests on the 8-virtual-device CPU mesh (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.core.mesh import MeshSpec, create_mesh
from gcn_recommendation_tpu.models import get_model
from gcn_recommendation_tpu.ops.topk import masked_topk_scores
from gcn_recommendation_tpu.parallel.spmd import (
    ShardedTrainer,
    pad_rows,
    sharded_topk_eval_batch,
)
from gcn_recommendation_tpu.train.trainer import Trainer


def test_mesh_creation_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = create_mesh(MeshSpec(data=2, model=4))
    assert mesh.shape == {"data": 2, "model": 4}


def test_sharded_topk_matches_single_device():
    rng = np.random.default_rng(0)
    B, I, d, k = 16, 100, 8, 5
    mesh = create_mesh(MeshSpec(data=2, model=4))
    u = rng.standard_normal((B, d)).astype(np.float32)
    items = rng.standard_normal((I, d)).astype(np.float32)
    filt = np.full((B, 4), I, np.int32)
    filt[0, :2] = [3, 97]
    filt[5, 0] = 42

    items_pad = pad_rows(items, 4 * 8)  # even shards, zero rows

    vals_s, idx_s = sharded_topk_eval_batch(
        mesh, jnp.asarray(u), jnp.asarray(items_pad), jnp.asarray(filt),
        k, num_valid_items=I,
    )
    vals_r, idx_r = masked_topk_scores(
        jnp.asarray(u), jnp.asarray(items), jnp.asarray(filt), k
    )
    np.testing.assert_allclose(np.asarray(vals_s), np.asarray(vals_r), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_sharded_topk_excludes_pad_rows_on_negative_scores():
    # Zero pad rows score 0, which beats all-negative real scores — the
    # num_valid_items mask must keep nonexistent item ids out of the top-k.
    rng = np.random.default_rng(1)
    B, I, d, k = 8, 30, 8, 20
    mesh = create_mesh(MeshSpec(data=2, model=4))
    u = -np.abs(rng.standard_normal((B, d))).astype(np.float32)
    items = np.abs(rng.standard_normal((I, d))).astype(np.float32)
    filt = np.full((B, 2), I, np.int32)
    items_pad = pad_rows(items, 4 * 8)  # pads 30 -> 32
    _, idx = sharded_topk_eval_batch(
        mesh, jnp.asarray(u), jnp.asarray(items_pad), jnp.asarray(filt),
        k, num_valid_items=I,
    )
    assert int(np.asarray(idx).max()) < I


def test_sharded_topk_starved_candidates_use_index_sentinel():
    # Fewer real candidates than k across all shards: the pad slots must
    # carry an out-of-catalog index (>= num_valid_items), never a
    # fabricated real item id (ADVICE.md round-1 finding).
    rng = np.random.default_rng(2)
    B, I, d, k = 4, 6, 8, 20
    mesh = create_mesh(MeshSpec(data=2, model=4))
    u = rng.standard_normal((B, d)).astype(np.float32)
    items = rng.standard_normal((I, d)).astype(np.float32)
    items_pad = pad_rows(items, 4 * 8)
    # user 0 additionally has every real item filtered
    filt = np.full((B, I), I + 1000, np.int32)
    filt[0] = np.arange(I, dtype=np.int32)
    from gcn_recommendation_tpu.ops.topk import MASK_VALUE

    vals, idx = sharded_topk_eval_batch(
        mesh, jnp.asarray(u), jnp.asarray(items_pad), jnp.asarray(filt),
        k, num_valid_items=I,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    # only I real candidates exist -> the tail k - I slots are sentinels
    masked = vals <= MASK_VALUE / 2
    assert masked[:, I:].all()
    assert (idx[masked] >= I).all(), "pad slot leaked a real item id"
    assert masked[0].all(), "fully-filtered user should have no candidates"
    # unfiltered users still get the I real items first, ranked correctly
    ref_vals, ref_idx = masked_topk_scores(
        jnp.asarray(u[1:]), jnp.asarray(items), jnp.asarray(filt[1:]), I
    )
    np.testing.assert_array_equal(idx[1:, :I], np.asarray(ref_idx))


def test_sharded_quantized_topk_starved_and_k_over_shard():
    """The int8 sharded scorer shares _mask_local_topk with the f32
    path — prove the edge semantics survive the composition: k larger
    than the per-shard row count, pad rows masked, starved slots
    carrying out-of-catalog index sentinels, and agreement with the
    single-device int8 kernel on the real candidates."""
    from gcn_recommendation_tpu.ops.quant import (
        quantize_rows_int8,
        quantized_topk_scores,
    )
    from gcn_recommendation_tpu.ops.topk import MASK_VALUE
    from gcn_recommendation_tpu.parallel.spmd import (
        sharded_quantized_topk_batch,
    )

    rng = np.random.default_rng(3)
    B, I, d, k = 4, 6, 8, 20  # k=20 > shard_items=8 (I padded to 32 / 4)
    mesh = create_mesh(MeshSpec(data=2, model=4))
    u = rng.standard_normal((B, d)).astype(np.float32)
    items = rng.standard_normal((I, d)).astype(np.float32)
    q, s = quantize_rows_int8(jnp.asarray(items), use_pallas=False)
    q_pad = pad_rows(np.asarray(q), 4 * 8)
    s_pad = np.concatenate(
        [np.asarray(s), np.ones((q_pad.shape[0] - I, 1), np.float32)]
    )
    filt = np.full((B, I), I + 1000, np.int32)
    filt[0] = np.arange(I, dtype=np.int32)  # user 0 fully filtered

    vals, idx = sharded_quantized_topk_batch(
        mesh, jnp.asarray(u), jnp.asarray(q_pad), jnp.asarray(s_pad),
        jnp.asarray(filt), k, num_valid_items=I,
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    masked = vals <= MASK_VALUE / 2
    assert masked[:, I:].all()
    assert (idx[masked] >= I).all(), "pad slot leaked a real item id"
    assert masked[0].all()
    ref_vals, ref_idx = quantized_topk_scores(
        jnp.asarray(u[1:]), q, s, jnp.asarray(filt[1:]), I
    )
    np.testing.assert_array_equal(idx[1:, :I], np.asarray(ref_idx))
    np.testing.assert_allclose(vals[1:, :I], np.asarray(ref_vals), rtol=1e-6)


@pytest.fixture()
def sharded_pair(tiny_bundle, tmp_path):
    bundle, _ = tiny_bundle
    cfg = Config(
        embedding_dim=16,
        n_layers=2,
        epochs=2,
        batch_size=128,
        checkpoint_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "res"),
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    return (
        Trainer(cfg, model, bundle),
        ShardedTrainer(cfg, model, bundle, mesh),
    )


def test_sharded_epoch_matches_single_device(sharded_pair):
    single, sharded = sharded_pair
    p1, o1 = single.init_state(jax.random.PRNGKey(0))
    p2, o2 = sharded.init_state(jax.random.PRNGKey(0))
    # identical init
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))

    p1, o1, l1 = single._epoch_fn(p1, o1, jax.random.PRNGKey(7))
    p2, o2, l2 = sharded._epoch_fn(p2, o2, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-4, atol=1e-6
        )


def test_sharded_state_is_actually_sharded(sharded_pair):
    _, sharded = sharded_pair
    params, _ = sharded.init_state(jax.random.PRNGKey(0))
    sh = params["user_embedding"].sharding
    assert sh.spec[0] == "model"


def test_sharded_validate_runs(sharded_pair):
    _, sharded = sharded_pair
    params, _ = sharded.init_state(jax.random.PRNGKey(0))
    recall, ndcg = sharded.validate(params)
    assert 0.0 <= recall <= 1.0
    assert 0.0 <= ndcg <= 1.0


def test_sharded_validate_matches_single_device(sharded_pair):
    single, sharded = sharded_pair
    params, _ = single.init_state(jax.random.PRNGKey(0))
    r1, n1 = single.validate(params)
    r2, n2 = sharded.validate(params)  # distributed top-k path
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    np.testing.assert_allclose(n1, n2, rtol=1e-5)


def test_sharded_eval_wide_tiers_match_single_device():
    """The scanned sharded evaluator must agree with the single-device
    evaluator when users span the full filter-width ladder — heavy
    seen-sets exercise the scatter tiers, the global->local filter
    translation, and the zero-pad-row index masking."""
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.ops.topk import compare_max_f
    from gcn_recommendation_tpu.parallel.spmd import evaluate_sharded
    from gcn_recommendation_tpu.train.evaluate import evaluate_embeddings

    rng = np.random.default_rng(11)
    nu, ni, d, k = 24, 20_000, 8, 10
    c0 = compare_max_f(ni)
    fu = rng.standard_normal((nu, d)).astype(np.float32)
    fi = rng.standard_normal((ni, d)).astype(np.float32)

    degs = [5] * 8 + [c0 + 200] * 8 + [1500] * 8  # narrow / mid / top tier
    tr_u, tr_i = [], []
    for u, n_seen in enumerate(degs):
        items = rng.choice(ni, size=n_seen, replace=False)
        tr_u.extend([u] * n_seen)
        tr_i.extend(items.tolist())
    train = Interactions(np.asarray(tr_u, np.int32), np.asarray(tr_i, np.int32))
    val = Interactions(
        np.arange(nu, dtype=np.int32),
        rng.integers(0, ni, nu).astype(np.int32),
    )

    mesh = create_mesh(MeshSpec(data=2, model=4))
    r_ref, n_ref = evaluate_embeddings(
        jnp.asarray(fu), jnp.asarray(fi), val, train, nu, ni, k, batch_size=4
    )
    r_sh, n_sh = evaluate_sharded(
        mesh, jnp.asarray(fu), jnp.asarray(fi), val, train, nu, ni, k,
        batch_size=4,
    )
    np.testing.assert_allclose(r_sh, r_ref, rtol=1e-6)
    np.testing.assert_allclose(n_sh, n_ref, rtol=1e-5)


@pytest.mark.parametrize("mesh_shape,batch", [
    ((8, 1), 4),   # pure DP: items unsharded, users split 8 ways
    ((4, 2), 4),   # both axes active
    ((2, 4), 3),   # batch does not divide data axis -> replicated fallback
])
def test_sharded_eval_data_axis_matches_single_device(mesh_shape, batch):
    """Round-2 VERDICT #3: eval batches split over the DATA axis (and the
    pure-DP mesh no longer falls back to a replicated evaluator) — all
    mesh shapes must agree with the single-device evaluator exactly."""
    from gcn_recommendation_tpu.data.loader import Interactions
    from gcn_recommendation_tpu.parallel.spmd import evaluate_sharded
    from gcn_recommendation_tpu.train.evaluate import evaluate_embeddings

    rng = np.random.default_rng(21)
    nu, ni, d, k = 30, 500, 8, 10
    fu = rng.standard_normal((nu, d)).astype(np.float32)
    fi = rng.standard_normal((ni, d)).astype(np.float32)
    tr_u = np.repeat(np.arange(nu, dtype=np.int32), 6)
    tr_i = rng.integers(0, ni, nu * 6).astype(np.int32)
    train = Interactions(tr_u, tr_i)
    val = Interactions(
        np.arange(nu, dtype=np.int32),
        rng.integers(0, ni, nu).astype(np.int32),
    )
    mesh = create_mesh(MeshSpec(*mesh_shape))
    r_ref, n_ref = evaluate_embeddings(
        jnp.asarray(fu), jnp.asarray(fi), val, train, nu, ni, k,
        batch_size=batch,
    )
    r_sh, n_sh = evaluate_sharded(
        mesh, jnp.asarray(fu), jnp.asarray(fi), val, train, nu, ni, k,
        batch_size=batch,
    )
    np.testing.assert_allclose(r_sh, r_ref, rtol=1e-6)
    np.testing.assert_allclose(n_sh, n_ref, rtol=1e-5)


def test_pure_dp_trainer_validate_matches_single_device(tiny_bundle, tmp_path):
    """A pure-DP (8,1) ShardedTrainer's validate must use the data-sharded
    evaluator (not the old replicated fallback) and agree exactly."""
    bundle, _ = tiny_bundle
    cfg = Config(embedding_dim=16, n_layers=2, epochs=1, batch_size=128,
                 checkpoint_dir=str(tmp_path / "c"), results_dir=str(tmp_path / "r"))
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=8, model=1))
    sharded = ShardedTrainer(cfg, model, bundle, mesh)
    single = Trainer(cfg, model, bundle)
    params, _ = single.init_state(jax.random.PRNGKey(0))
    r1, n1 = single.validate(params)
    r2, n2 = sharded.validate(params)
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    np.testing.assert_allclose(n1, n2, rtol=1e-5)


@pytest.fixture(scope="module")
def nondivisible_bundle():
    """Deliberately non-divisible table sizes on a 4-way model axis
    (round-1 VERDICT.md #1: real vocab sizes almost never divide the
    mesh, and silent replication threw away the TP memory win)."""
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle

    return synthetic_bundle(
        num_users=90, num_items=70, num_brands=11, mean_degree=8.0, seed=0
    )


def test_padded_tp_nondivisible_matches_single_device(nondivisible_bundle):
    bundle = nondivisible_bundle
    cfg = Config(embedding_dim=16, n_layers=2, epochs=1, batch_size=64)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    single = Trainer(cfg, model, bundle)
    sharded = ShardedTrainer(cfg, model, bundle, mesh)

    # the caller's model object must stay unpadded (shared instances)
    assert model.num_users_pad == 90
    assert sharded.model is not model
    assert sharded.model.num_users_pad == 92
    assert sharded.model.num_items_pad == 72
    assert sharded.model.num_brands_pad == 12

    p1, o1 = single.init_state(jax.random.PRNGKey(0))
    p2, o2 = sharded.init_state(jax.random.PRNGKey(0))
    # every table row-sharded over 'model' — no silent replication
    for k in ("user_embedding", "item_embedding", "brand_embedding"):
        assert p2[k].sharding.spec[0] == "model", k
    # logical rows RNG-identical to the unpadded init; pad rows zero
    for k in p1:
        logical = p1[k].shape[0]
        np.testing.assert_array_equal(
            np.asarray(p1[k]), np.asarray(p2[k])[:logical]
        )
        np.testing.assert_array_equal(np.asarray(p2[k])[logical:], 0.0)

    p1, o1, l1 = single._epoch_fn(p1, o1, jax.random.PRNGKey(7))
    p2, o2, l2 = sharded._epoch_fn(p2, o2, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6)
    for k in p1:
        logical = p1[k].shape[0]
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k])[:logical], rtol=1e-4, atol=1e-6
        )
        # pad rows receive zero gradient and stay exactly zero under Adam
        np.testing.assert_array_equal(np.asarray(p2[k])[logical:], 0.0)

    r1, n1 = single.validate(p1)
    r2, n2 = sharded.validate(p2)
    np.testing.assert_allclose(r1, r2, rtol=1e-6)
    np.testing.assert_allclose(n1, n2, rtol=1e-5)


def test_padded_tp_checkpoint_is_logical_and_portable(
    nondivisible_bundle, tmp_path
):
    """Checkpoints written by a padded sharded trainer store *logical*
    table shapes, restore into an unpadded single-device trainer, and
    resume back into the padded trainer."""
    from gcn_recommendation_tpu.utils import checkpoint as ckpt

    bundle = nondivisible_bundle
    cfg = Config(
        embedding_dim=16, n_layers=2, epochs=2, batch_size=64, val_interval=2,
        checkpoint_dir=str(tmp_path / "ck"), results_dir=str(tmp_path / "res"),
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    sharded = ShardedTrainer(cfg, model, bundle, mesh)
    _, best = sharded.fit()
    assert best > 0.0

    single = Trainer(cfg, model, bundle)
    p, o = single.init_state(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "ck" / cfg.checkpoint_name())
    restored = ckpt.load_best(ckpt_dir, p, o)
    assert restored is not None
    assert restored[0]["user_embedding"].shape[0] == bundle.num_users
    r, _ = single.validate(restored[0])
    np.testing.assert_allclose(r, best, rtol=1e-6)

    cfg.epochs = 4
    params2, best2 = sharded.fit(resume=True)
    assert best2 >= best
    assert params2["user_embedding"].shape[0] == 92
    assert params2["user_embedding"].sharding.spec[0] == "model"


def test_padded_tp_fusion_trains(nondivisible_bundle):
    """LightGCN_Fusion under padded TP: the frozen content matrix rides
    the item-table padding and row-shards too."""
    bundle = nondivisible_bundle
    cfg = Config(embedding_dim=16, n_layers=2, epochs=1, batch_size=64)
    pre = np.random.default_rng(3).standard_normal(
        (bundle.num_items, 16)
    ).astype(np.float32)
    model = get_model("LightGCN_Fusion")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg,
        pretrained_item_emb=pre,
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    tr = ShardedTrainer(cfg, model, bundle, mesh)
    params, opt = tr.init_state(jax.random.PRNGKey(0))
    assert params["item_content_embedding"].shape[0] == 72
    assert params["item_content_embedding"].sharding.spec[0] == "model"
    _, _, losses = tr._epoch_fn(params, opt, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(losses)).all()


def test_shard_params_warns_on_large_nondivisible_table():
    from gcn_recommendation_tpu.parallel.spmd import shard_params

    mesh = create_mesh(MeshSpec(data=2, model=4))
    bad = {"big_table": jnp.zeros((1025, 4), jnp.float32)}
    with pytest.warns(UserWarning, match="replicating a large table"):
        shard_params(bad, mesh)


def test_sharded_fit_checkpoint_and_resume(tiny_bundle, tmp_path):
    """fit + resume through ShardedTrainer: restored (host numpy) state is
    re-sharded over the mesh by _place_state before training continues."""
    bundle, _ = tiny_bundle
    cfg = Config(
        embedding_dim=16, n_layers=2, epochs=2, batch_size=128, val_interval=2,
        checkpoint_dir=str(tmp_path / "ck"), results_dir=str(tmp_path / "res"),
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    tr = ShardedTrainer(cfg, model, bundle, mesh)
    _, best = tr.fit()
    assert best > 0.0
    tr.config.epochs = 4
    params2, best2 = tr.fit(resume=True)
    assert best2 >= best
    assert params2["user_embedding"].sharding.spec[0] == "model"
