"""Experiment: bf16 propagation-storage accuracy at books scale (TPU).

Trains LightGCN on the bench-scale latent-factor synthetic graph twice —
compute_dtype float32 vs bfloat16 — and compares val Recall@20 / NDCG@20
curves and epoch wall time.  ROADMAP item: "validate recall impact with
the parity harness at books scale, then consider defaulting".

Run on the TPU host:  python tools/exp_bf16_accuracy.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPOCHS = 40


def run(dtype: str, bundle, workdir: str):
    import jax

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    cfg = Config(
        epochs=EPOCHS,
        val_interval=5,
        compute_dtype=dtype,
        checkpoint_dir=os.path.join(workdir, dtype, "ckpt"),
        results_dir=os.path.join(workdir, dtype, "results"),
    )
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    trainer = Trainer(cfg, model, bundle)
    t0 = time.perf_counter()
    _, best_recall = trainer.fit()
    wall = time.perf_counter() - t0
    print(f"[{dtype}] best val recall@20 = {best_recall:.4f}  "
          f"wall {wall:.0f}s ({EPOCHS} epochs)", flush=True)
    return best_recall


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle

    bundle = synthetic_bundle(
        num_users=50_000,
        num_items=20_000,
        num_brands=2_000,
        mean_degree=28.0,
        core=8,
        seed=42,
        style="latent",
    )
    print(
        f"graph: users={bundle.num_users} items={bundle.num_items} "
        f"train={len(bundle.train)}", flush=True,
    )
    with tempfile.TemporaryDirectory() as workdir:
        r32 = run("float32", bundle, workdir)
        r16 = run("bfloat16", bundle, workdir)
    print(f"SUMMARY recall@20: f32={r32:.4f} bf16={r16:.4f} "
          f"delta={(r16 - r32):+.4f} ({(r16 / max(r32, 1e-9) - 1) * 100:+.2f}%)",
          flush=True)


if __name__ == "__main__":
    main()
