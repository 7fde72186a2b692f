"""Pallas block-sparse tile propagation (graph/tiles.py + ops/block_spmm.py).

The tile partition must be an exact re-expression of ``A_norm @ emb``:
tiles + residual ELL + hub rows sum to the same symmetric matrix the
plain ELL path applies (reference formula: torch.sparse.mm at
models/lightgcn.py:44-46).  Off-TPU the kernel runs in the Pallas
interpreter, so these tests exercise the real kernel logic on the CPU
suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
from gcn_recommendation_tpu.graph.tiles import partition_tiles
from gcn_recommendation_tpu.ops.block_spmm import (
    TiledDeviceGraph,
    propagate_ell_tiles,
    to_device_tiles,
)
from gcn_recommendation_tpu.ops.spmm import propagate_ell, to_device_graph


@pytest.fixture(scope="module")
def heavy_bundle():
    # heavy-tailed graph (the regime the tile path exists for)
    return synthetic_bundle(
        num_users=1500, num_items=600, num_brands=40,
        mean_degree=24.0, core=6, seed=3, style="latent",
        pop_zipf=0.8, deg_sigma=1.0,
    )


def _reference_out(bundle, emb):
    dg = to_device_graph(bundle.graph)
    return propagate_ell(
        emb, dg.bucket_nbr_idx, dg.bucket_nbr_w, dg.gather_idx, dg.dense_mat
    )


def test_partition_is_exact(heavy_bundle):
    g = heavy_bundle.graph
    part = partition_tiles(g, min_fill=8, tiles_per_step=4)
    assert part is not None and part.num_tiles > 0
    # partition conservation: tile edges + residual edges == all edges
    assert part.covered_edges + part.residual.nnz == g.nnz

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((g.num_nodes, 32)).astype(np.float32))
    ref = _reference_out(heavy_bundle, emb)
    out = propagate_ell_tiles(
        emb, to_device_graph(part.residual), to_device_tiles(part)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_gradient_matches_ell(heavy_bundle):
    g = heavy_bundle.graph
    part = partition_tiles(g, min_fill=8, tiles_per_step=4)
    dg_res = to_device_graph(part.residual)
    tiles = to_device_tiles(part)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.standard_normal((g.num_nodes, 16)).astype(np.float32))

    g_tile = jax.grad(
        lambda e: jnp.sum(propagate_ell_tiles(e, dg_res, tiles) ** 2)
    )(emb)
    g_ref = jax.grad(
        lambda e: jnp.sum(_reference_out(heavy_bundle, e) ** 2)
    )(emb)
    np.testing.assert_allclose(
        np.asarray(g_tile), np.asarray(g_ref), atol=1e-3
    )


def test_min_fill_too_high_returns_none():
    bundle = synthetic_bundle(
        num_users=300, num_items=200, num_brands=10, mean_degree=6.0,
        core=3, seed=0,
    )
    assert partition_tiles(bundle.graph, min_fill=10_000) is None


def test_bf16_tiles_close(heavy_bundle):
    g = heavy_bundle.graph
    part = partition_tiles(g, min_fill=8, tiles_per_step=4)
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.standard_normal((g.num_nodes, 32)).astype(np.float32))
    ref = _reference_out(heavy_bundle, emb)
    out = propagate_ell_tiles(
        emb,
        to_device_graph(part.residual),
        to_device_tiles(part, tile_dtype=jnp.bfloat16),
    )
    # bf16 tile values: ~0.4% relative rounding like the hub bf16 mode
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    assert err < 2e-2 * scale


def test_trainer_flag_end_to_end(heavy_bundle):
    """tile_spmm=True must train to the same losses as the default path
    (same formulas, different kernel decomposition)."""
    import tempfile

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer
    from gcn_recommendation_tpu.utils.logging import Logger

    losses = {}
    for tile in (False, True):
        # 1 epoch + fill-16 keep the interpreter-mode kernel cheap on
        # the CPU suite while still crossing the tile path end-to-end;
        # checkpoint_dir must be isolated or the best-model save lands
        # in the repo's default exp/checkpoints (found the hard way: a
        # later TPU serve drive restored this test's (1500, 32) tables)
        out = tempfile.mkdtemp(prefix="tile_ckpt_")
        cfg = Config(epochs=1, val_interval=1, batch_size=512,
                     embedding_dim=32, tile_spmm=tile, tile_min_fill=16,
                     checkpoint_dir=out)
        model = get_model("LightGCN")(
            heavy_bundle.num_users, heavy_bundle.num_items,
            heavy_bundle.num_brands, cfg,
        )
        logger = Logger(tempfile.mkdtemp(prefix="tile_"), "t",
                        top_k=cfg.top_k)
        tr = Trainer(cfg, model, heavy_bundle, logger=logger)
        if tile:
            assert type(tr.arrays.graph).__name__ == "TiledDeviceGraph"
        tr.fit()
        losses[tile] = np.asarray(logger.history["epoch_avg_loss"],
                                  dtype=np.float64)
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-3)
