"""End-to-end accuracy parity: this framework vs. the actual reference code.

Generates one synthetic dataset, lays it out exactly where the reference
expects it (the hard-coded ``dataset/steam_emb/processed_data_<core>``,
main.py:58), trains BOTH implementations with identical hyperparameters,
and compares the best validation Recall@20 / NDCG@20.

The two runs use different RNG streams (torch vs JAX), so "parity" means
landing within the run-to-run variance band (BASELINE.md: duplicate
reference runs differ by <=0.002 recall on real data; small synthetic
data has wider variance, so the tolerance here is looser).

Usage:  python tools/parity_vs_reference.py [--epochs 30] [--tol 0.15]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

# allow running while another process holds the axon TPU tunnel (the env
# var alone is ignored by the plugin — jax.config works, same as tests)
_forced = os.environ.get("GCN_TPU_FORCE_PLATFORM")
if _forced:
    import jax

    jax.config.update("jax_platforms", _forced)


def generate(workdir: str, core: int, seed: int, embedding_dim=None) -> str:
    from gcn_recommendation_tpu.data.synthetic import generate_synthetic_dataset

    data_dir = os.path.join(workdir, "dataset", "steam_emb", f"processed_data_{core}")
    generate_synthetic_dataset(
        data_dir,
        num_users=2000,
        num_items=800,
        num_brands=40,
        mean_degree=18.0,
        core=5,
        seed=seed,
        embedding_dim=embedding_dim,
    )
    return data_dir


def run_reference(workdir: str, epochs: int, model_name="LightGCN",
                  use_pretrained=False) -> dict:
    """Run the unmodified reference main.py (torch CPU) against the
    synthetic dataset and parse its epoch-history CSV."""
    env = dict(os.environ)
    env.pop("CUDA_VISIBLE_DEVICES", None)
    # reference imports models/ relative to its own tree
    env["PYTHONPATH"] = REFERENCE
    env["MPLBACKEND"] = "Agg"
    cmd = [sys.executable, os.path.join(REFERENCE, "main.py"), "train",
           "--epochs", str(epochs), "--model_name", model_name]
    run_name = f"{model_name}_brand"
    if use_pretrained:
        cmd.append("--use_pretrained_emb")
        run_name += "_pretrained"
    subprocess.run(
        cmd,
        cwd=workdir,
        env=env,
        check=True,
        timeout=3600,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    import pandas as pd

    csv = os.path.join(
        workdir, f"exp/results/results/{run_name}_epoch_history.csv"
    )
    df = pd.read_csv(csv)
    best = df.loc[df["recall"].idxmax()]
    return {
        "best_recall": float(best["recall"]),
        "best_ndcg": float(best["ndcg"]),
        "final_recall": float(df["recall"].iloc[-1]),
        "curve": df.to_dict("records"),
    }


def run_ours(workdir: str, data_dir: str, epochs: int, model_name="LightGCN",
             use_pretrained=False) -> dict:
    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.loader import load_preprocessed_data
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer
    from gcn_recommendation_tpu.utils.logging import Logger
    import pandas as pd

    cfg = Config(
        epochs=epochs,
        model_name=model_name,
        use_pretrained_emb=use_pretrained,
        processed_data_dir=data_dir,
        checkpoint_dir=os.path.join(workdir, "ours", "ckpt"),
        results_dir=os.path.join(workdir, "ours", "results"),
    )
    bundle = load_preprocessed_data(data_dir, use_brand=True, verbose=False)
    pretrained = None
    if use_pretrained or model_name == "LightGCN_Fusion":
        import numpy as np

        pretrained = np.load(os.path.join(data_dir, "item_embeddings.npy"))
    model = get_model(model_name)(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg,
        pretrained_item_emb=pretrained,
    )
    logger = Logger(cfg.results_dir, cfg.logger_name(), top_k=cfg.top_k)
    trainer = Trainer(cfg, model, bundle, logger=logger)
    trainer.fit()
    csv = os.path.join(cfg.results_dir, f"{cfg.logger_name()}_epoch_history.csv")
    df = pd.read_csv(csv)
    best = df.loc[df["recall"].idxmax()]
    return {
        "best_recall": float(best["recall"]),
        "best_ndcg": float(best["ndcg"]),
        "final_recall": float(df["recall"].iloc[-1]),
        "curve": df.to_dict("records"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--model", type=str, default="LightGCN",
                    choices=["LightGCN", "LightGCN_Fusion"])
    ap.add_argument("--use_pretrained_emb", action="store_true")
    ap.add_argument("--core", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--tol", type=float, default=0.15,
                    help="relative tolerance on best recall")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", type=str, default=None,
                    help="write the full comparison JSON here")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="parity_")
    try:
        need_emb = args.use_pretrained_emb or args.model == "LightGCN_Fusion"
        data_dir = generate(
            workdir, args.core, args.seed,
            embedding_dim=64 if need_emb else None,
        )
        print(f"dataset at {data_dir}")
        print("running reference (torch CPU)...", flush=True)
        ref = run_reference(workdir, args.epochs, args.model, args.use_pretrained_emb)
        print(f"  reference best recall={ref['best_recall']:.4f} "
              f"ndcg={ref['best_ndcg']:.4f}")
        print("running gcn_recommendation_tpu...", flush=True)
        ours = run_ours(workdir, data_dir, args.epochs, args.model, args.use_pretrained_emb)
        print(f"  ours      best recall={ours['best_recall']:.4f} "
              f"ndcg={ours['best_ndcg']:.4f}")

        rel = abs(ours["best_recall"] - ref["best_recall"]) / max(
            ref["best_recall"], 1e-9
        )
        verdict = "PASS" if rel <= args.tol else "FAIL"
        print(f"relative diff {rel:.3f} (tol {args.tol}) -> {verdict}")
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"reference": ref, "ours": ours, "rel_diff": rel}, f, indent=2)
        return 0 if verdict == "PASS" else 1
    finally:
        if args.keep:
            print(f"workdir kept: {workdir}")
        else:
            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
