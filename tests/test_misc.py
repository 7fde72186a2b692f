"""Logger artifacts, CLI wiring, scaled configs, distributed helpers."""

import os

import jax
import numpy as np
import pytest

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.utils.logging import Logger


def test_logger_csv_schema_matches_reference(tmp_path):
    lg = Logger(str(tmp_path), "TestModel_brand", top_k=20)
    for s in range(4):
        lg.log_batch_loss(0.5 - 0.1 * s)
    lg.log_epoch_metrics(5, 0.35, 0.12, 0.05)
    lg.save(total_epochs=5)
    import pandas as pd

    df = pd.read_csv(tmp_path / "TestModel_brand_epoch_history.csv")
    # exact reference schema (main.py:119-124)
    assert list(df.columns) == ["epoch", "avg_loss", "recall", "ndcg"]
    assert df.iloc[0]["epoch"] == 5
    assert os.path.exists(tmp_path / "TestModel_brand_training_curves.png")


def test_logger_empty_history_no_crash(tmp_path):
    lg = Logger(str(tmp_path), "Empty")
    lg.save(total_epochs=1)  # mirrors main.py:114-116 early return
    assert not os.path.exists(tmp_path / "Empty_epoch_history.csv")


def test_config_checkpoint_name_encoding():
    # mirrors main.py:613-615
    c = Config(model_name="LightGCN", core=20, use_brand=False, use_pretrained_emb=True)
    assert c.checkpoint_name() == "best_lightgcn_core20_no_brand_embed"
    c2 = Config(model_name="LightGCN_Fusion", core=16)
    assert c2.checkpoint_name() == "best_lightgcn_fusion_core16"


def test_config_logger_name():
    # mirrors main.py:444-446
    c = Config(model_name="LightGCN", use_brand=True, use_pretrained_emb=True)
    assert c.logger_name() == "LightGCN_brand_pretrained"


def test_config_debug_mode_mirrors_reference():
    c = Config(debug=True, epochs=150)
    assert c.epochs == 5 and c.batch_size == 128 and c.val_interval == 1
    assert c.checkpoint_dir.startswith("debug")


def test_config_unknown_dataset_raises():
    with pytest.raises(ValueError, match="Unknown dataset"):
        _ = Config(dataset="nope").data_dir


def test_cli_parser_reference_flags():
    from gcn_recommendation_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(
        ["train", "--model_name", "LightGCN_Fusion", "--core", "20",
         "--epochs", "10", "--no_brand", "--brand_loss", "--debug",
         "--use_pretrained_emb"]
    )
    assert a.model_name == "LightGCN_Fusion" and a.brand_loss and a.no_brand


def test_scaled_config_dim256_4layers_sharded(tiny_bundle, tmp_path):
    """North-star scaled config: dim-256, 4 layers, row-sharded tables."""
    from gcn_recommendation_tpu.core.mesh import MeshSpec, create_mesh
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.parallel.spmd import ShardedTrainer

    bundle, _ = tiny_bundle
    cfg = Config(
        embedding_dim=256,
        n_layers=4,
        epochs=1,
        batch_size=64,
        checkpoint_dir=str(tmp_path / "ck"),
        results_dir=str(tmp_path / "rs"),
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    mesh = create_mesh(MeshSpec(data=2, model=4))
    tr = ShardedTrainer(cfg, model, bundle, mesh)
    params, opt_state = tr.init_state(jax.random.PRNGKey(0))
    assert params["user_embedding"].shape == (bundle.num_users, 256)
    params, opt_state, losses = tr._epoch_fn(params, opt_state, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(losses)).all()


def test_distributed_helpers_single_host():
    from gcn_recommendation_tpu.core.distributed import auto_mesh_spec, initialize

    assert initialize() is False  # single host, no-op
    spec = auto_mesh_spec()
    assert spec.data * spec.model == len(jax.devices())


def test_logger_writes_throughput_csv(tmp_path):
    lg = Logger(str(tmp_path), "TP", top_k=20)
    lg.log_batch_loss(0.4)
    lg.log_epoch_metrics(1, 0.4, 0.1, 0.05)
    lg.log_throughput(1000.0)
    lg.log_throughput(1200.0)
    lg.save(total_epochs=2)
    import pandas as pd

    df = pd.read_csv(tmp_path / "TP_throughput.csv")
    assert list(df.columns) == ["epoch", "examples_per_sec"]
    assert len(df) == 2


def test_config_debug_nests_absolute_output_dirs(tmp_path):
    # os.path.join('debug', abs) returns abs unchanged — a --debug run
    # must never write into the real run's directories
    c = Config(
        debug=True,
        checkpoint_dir=str(tmp_path / "exp" / "ck"),
        results_dir=str(tmp_path / "exp" / "res"),
    )
    assert c.checkpoint_dir != str(tmp_path / "exp" / "ck")
    assert "debug" in c.checkpoint_dir and "debug" in c.results_dir


def test_config_debug_respects_explicit_flags():
    # explicit batch_size/val_interval win over the debug defaults;
    # epochs stay forced to 5 (reference main.py:79-80)
    c = Config(debug=True, batch_size=1024, val_interval=2, epochs=50)
    assert c.batch_size == 1024 and c.val_interval == 2 and c.epochs == 5


def test_logger_resume_step_priming(tmp_path):
    lg = Logger(str(tmp_path), "Resume")
    lg.set_start_step(100)
    lg.log_batch_loss(0.5)
    assert lg.history["step"][0] == 100
