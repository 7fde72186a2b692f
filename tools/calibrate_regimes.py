"""Calibrate synthetic regime knobs against the reference recall bands.

The reference commits experiment grids on FOUR datasets spanning very
different catalog-density regimes (BASELINE.md):

* ``exp/``       dense catalog   — LightGCN R@20 ~ 0.66
* ``exp_books/`` sparse books    — ~ 0.087          (exp_synth matches this)
* ``exp_sport/`` sparse sport    — ~ 0.05 (Fusion best-epoch)
* ``exp_zno/``   weak-signal     — ~ 0.06

Only the books regime had a synthetic counterpart (round-2 verdict
Missing #2).  This tool short-trains LightGCN on candidate latent-model
knob settings (data/synthetic.py: temperature / latent_dim / catalog
size / degree) and prints the recall trajectory, so the dense and zno
dataset definitions committed in tools/run_regime_grids.py are measured,
not guessed.

Run on the TPU host:
    python tools/calibrate_regimes.py --regime dense
    python tools/calibrate_regimes.py --regime zno
    python tools/calibrate_regimes.py --num_users 6000 --num_items 2500 \
        --mean_degree 50 --temperature 0.2 --latent_dim 8 --epochs 40
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# committed regime definitions (calibrated with this tool; the books
# regime is the existing exp_synth dataset, shown for reference)
REGIMES = {
    "books": dict(num_users=10000, num_items=5000, num_brands=200,
                  mean_degree=25.0, latent_dim=16, temperature=0.35,
                  pop_scale=0.5),
    # dense steam-like: popularity-concentrated taste.  Calibrated
    # against the ORACLE recall (top-20 by true preference scores given
    # the realized draws — the ceiling no amount of training can beat):
    # temp 0.27 / pop 1.0 gives oracle 0.685, and the 150-epoch TPU run
    # climbs to 0.647 at ep150 — matching the reference exp/ band (best
    # 0.662 at ep135) in value AND curve shape (slow climb, late best).
    # An earlier temp-0.18 setting plateaued in-band at ep30 but its
    # near-deterministic draws put the oracle at 0.86, so long training
    # blew past the band (0.76 by ep150) — anchor on the oracle, not an
    # early plateau.
    "dense": dict(num_users=6000, num_items=2500, num_brands=100,
                  mean_degree=50.0, latent_dim=8, temperature=0.27,
                  pop_scale=1.0),
    # weak-signal regime: TPU-calibrated to the reference exp_zno band
    # (best R@20 0.058-0.062 across its duplicate runs) — temperature
    # 0.40/dim 20 measures 0.057 at convergence (flat from epoch 5),
    # and the oracle ceiling is 0.074, so long training stays in-band
    "zno": dict(num_users=12000, num_items=8000, num_brands=300,
                mean_degree=15.0, latent_dim=20, temperature=0.40,
                pop_scale=0.5),
    # sparse sport regime: the reference exp_sport/ commits exactly ONE
    # run (Fusion, best R@20 0.0499 at ep25 decaying to 0.0447).
    # Round-4 TPU probes: temp 0.44 -> fus best 0.0418; deg 20/temp
    # 0.46 -> 0.0403; temp 0.41 -> 0.0522 at ep35 (chosen — the band
    # and the early-peak epoch match; the post-peak decay is steeper
    # than the reference's, the same fusion-layer overfit seen on the
    # books regime at synthetic scale, documented in REGIMES.md)
    "sport": dict(num_users=12000, num_items=10000, num_brands=300,
                  mean_degree=13.0, latent_dim=20, temperature=0.41,
                  pop_scale=0.5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=sorted(REGIMES), default=None)
    ap.add_argument("--num_users", type=int, default=6000)
    ap.add_argument("--num_items", type=int, default=2500)
    ap.add_argument("--num_brands", type=int, default=100)
    ap.add_argument("--mean_degree", type=float, default=50.0)
    ap.add_argument("--latent_dim", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=0.2)
    ap.add_argument("--pop_scale", type=float, default=0.5)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--val_interval", type=int, default=5)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    if args.regime:
        for k, v in REGIMES[args.regime].items():
            setattr(args, k, v)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gcn_recommendation_tpu.config import Config
    from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
    from gcn_recommendation_tpu.models import get_model
    from gcn_recommendation_tpu.train.trainer import Trainer

    t0 = time.time()
    bundle = synthetic_bundle(
        num_users=args.num_users,
        num_items=args.num_items,
        num_brands=args.num_brands,
        mean_degree=args.mean_degree,
        core=16,
        seed=args.seed,
        style="latent",
        latent_dim=args.latent_dim,
        temperature=args.temperature,
        pop_scale=args.pop_scale,
    )
    print(
        f"bundle: users={bundle.num_users} items={bundle.num_items} "
        f"train={len(bundle.train)} nnz={bundle.graph.nnz} "
        f"({time.time() - t0:.1f}s)",
        flush=True,
    )
    cfg = Config(epochs=args.epochs, val_interval=args.val_interval)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    trainer = Trainer(cfg, model, bundle)
    trainer.fit()


if __name__ == "__main__":
    main()
