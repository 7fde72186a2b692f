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
    # books: the committed exp_synth/ grid's recipe.  Round 5 probed 20
    # single-lever variants against the reference's late-climb-and-hold
    # curve shape (REGIMES.md divergence #1 table): rank/taste split,
    # Zipf tails, factor spectrum, generator dims to 512, density,
    # catalog scale — none escapes the 10-25% post-peak decay within the
    # books band under Gaussian loadings; taste_style='cluster' posts
    # the best hold (0.935) and is the shape mechanism to re-band on in
    # a future recalibration.
    "books": dict(num_users=10000, num_items=5000, num_brands=200,
                  mean_degree=25.0, latent_dim=16, temperature=0.35,
                  pop_scale=0.5),
    # books_cluster: the next-round starting point for re-banding the
    # sparse regimes on the cluster generator.  End-of-round-5 TPU
    # probes (all split=rank/rank_key=taste): 50 comm x 3/user t0.3 ->
    # band 0.68 hold 0.935; 50 x 6 t0.5 -> 0.69 hold 0.997; 25 x 8
    # t0.6 -> 0.70; 20 comm x 10/user t0.6 ep150 -> 0.69 hold 0.988.
    # Holds are reference-grade but the BAND is insensitive to
    # clusters_per_user/temperature/community count in these ranges:
    # with rank_key='taste' the test item is the user's strongest-
    # community member, trivially top-ranked once communities are
    # learned.  Next levers to probe: raise the item jitter (the 0.25
    # in data/synthetic.py's cluster branch — make it a knob) so
    # within-community taste order is less learnable; rank_key='full';
    # or a cluster+gaussian hybrid where community explains only part
    # of the taste variance.
    "books_cluster": dict(num_users=10000, num_items=5000, num_brands=200,
                          mean_degree=25.0, latent_dim=50, temperature=0.3,
                          pop_scale=0.5, split="rank", rank_key="taste",
                          pop_zipf=0.6, deg_sigma=1.0,
                          taste_style="cluster", clusters_per_user=3),
    # dense steam-like: popularity-concentrated taste.  Calibrated
    # against the ORACLE recall (top-20 by true preference scores given
    # the realized draws — the ceiling no amount of training can beat).
    # Round-5 recalibration (VERDICT r4 weak #1): mean_degree 50 -> 100
    # doubles examples/parameter so base CONVERGES by ep135 like the
    # reference's dense runs do (measured probe: oracle 0.668, best
    # 0.6365 at ep135, final 0.6355, hold 0.998 — reference exp/ best
    # 0.662 at ep135, hold ~1.0).  The old deg-50 recipe sat in-band at
    # ep150 but was still climbing (300-epoch extension reached 0.6703
    # at ep265), which made every faster-converging init variant show a
    # fake "uplift" at the ep150 protocol cutoff.
    "dense": dict(num_users=6000, num_items=2500, num_brands=100,
                  mean_degree=100.0, latent_dim=8, temperature=0.27,
                  pop_scale=1.0, emb_style="mislead"),
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
    ap.add_argument("--split", choices=["random", "rank"], default=None,
                    help="Leave-one-out mode (default: the regime's; "
                         "'rank' = reference rating-rank protocol)")
    ap.add_argument("--pop_df", type=float, default=None,
                    help="Student-t df for popularity logits (heavy tail)")
    ap.add_argument("--deg_sigma", type=float, default=None,
                    help="Lognormal sigma of user degrees")
    ap.add_argument("--spectrum", type=float, default=None,
                    help="Power-law decay of taste-factor variances")
    ap.add_argument("--pop_zipf", type=float, default=None,
                    help="Exact-Zipf popularity exponent (overrides "
                         "pop_df/pop_scale's distribution)")
    ap.add_argument("--taste_style", choices=["gaussian", "cluster"],
                    default=None,
                    help="Factor-loading distribution ('cluster' = item "
                         "communities; latent_dim = community count)")
    ap.add_argument("--clusters_per_user", type=int, default=None)
    ap.add_argument("--rank_key", choices=["full", "taste"], default=None,
                    help="Rank-split ordering key ('taste' = rating-rank "
                         "analogue, popularity excluded)")
    ap.add_argument("--oracle", action="store_true",
                    help="Also print the oracle recall@20 of the true "
                         "generative scores on the val split")
    args = ap.parse_args()
    # CLI flags for the tail/split knobs override the regime dict;
    # unset anywhere -> generator defaults
    cli = {k: getattr(args, k)
           for k in ("split", "pop_df", "deg_sigma", "spectrum", "pop_zipf",
                     "rank_key", "taste_style", "clusters_per_user")
           if getattr(args, k) is not None}
    if args.regime:
        for k, v in REGIMES[args.regime].items():
            setattr(args, k, v)
    for k, default in (("split", "random"), ("pop_df", None),
                       ("deg_sigma", 0.5), ("spectrum", 0.0),
                       ("pop_zipf", None), ("rank_key", "full"),
                       ("taste_style", "gaussian"),
                       ("clusters_per_user", 3)):
        value = cli.get(k)
        if value is None:
            value = getattr(args, k, None)
        if value is None:
            value = default
        setattr(args, k, value)

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
    bundle, (lu, lv, pop) = synthetic_bundle(
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
        split=args.split,
        pop_df=args.pop_df,
        deg_sigma=args.deg_sigma,
        spectrum=args.spectrum,
        pop_zipf=args.pop_zipf,
        rank_key=args.rank_key,
        taste_style=args.taste_style,
        clusters_per_user=args.clusters_per_user,
        return_latents=True,
    )
    import numpy as np

    item_deg = np.bincount(bundle.train.item_idx, minlength=bundle.num_items)
    print(
        f"bundle: users={bundle.num_users} items={bundle.num_items} "
        f"train={len(bundle.train)} nnz={bundle.graph.nnz} "
        f"split={args.split} rank_key={args.rank_key} "
        f"pop_df={args.pop_df} deg_sigma={args.deg_sigma} "
        f"item-deg p50/p90/max={int(np.percentile(item_deg, 50))}/"
        f"{int(np.percentile(item_deg, 90))}/{int(item_deg.max())} "
        f"({time.time() - t0:.1f}s)",
        flush=True,
    )
    if args.oracle:
        # recall@20 of ranking by the TRUE generative scores with train
        # items masked — the ceiling no trained model can beat; regimes
        # must be calibrated so the band sits safely below it
        hits = 0
        k = 20
        train_sets = {}
        for u, i in zip(bundle.train.user_idx, bundle.train.item_idx):
            train_sets.setdefault(int(u), set()).add(int(i))
        scores_all = lu @ lv.T + pop[None, :]
        for u, i in zip(bundle.val.user_idx, bundle.val.item_idx):
            s = scores_all[int(u)].copy()
            seen = train_sets.get(int(u))
            if seen:
                s[list(seen)] = -1e10
            top = np.argpartition(-s, k)[:k]
            hits += int(i) in set(int(t) for t in top)
        print(f"oracle recall@{k} (val): {hits / len(bundle.val):.4f}",
              flush=True)

    import tempfile

    from gcn_recommendation_tpu.utils.logging import Logger

    cfg = Config(epochs=args.epochs, val_interval=args.val_interval)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    logger = Logger(tempfile.mkdtemp(prefix="calib_"), "calib",
                    top_k=cfg.top_k)
    trainer = Trainer(cfg, model, bundle, logger=logger)
    trainer.fit()
    hist = logger.history
    if hist["epoch"]:
        recalls = np.asarray(hist["recall"])
        epochs = np.asarray(hist["epoch"])
        best = int(np.argmax(recalls))
        hold = recalls[-1] / max(recalls[best], 1e-12)
        print(
            f"SUMMARY best R@{cfg.top_k}={recalls[best]:.4f} "
            f"(ep{epochs[best]}) final={recalls[-1]:.4f} (ep{epochs[-1]}) "
            f"hold={hold:.3f} peak_frac={epochs[best] / epochs[-1]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
