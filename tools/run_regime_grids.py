"""Generate the dense/zno regime datasets and run the 13-code grid on each.

Round-2 verdict Missing #2: the reference commits experiment grids on
FOUR datasets spanning very different data regimes (dense ``exp/``
R@20~0.66, books ``exp_books/``~0.09, sport, weak-signal ``exp_zno/``
~0.06), while the repo's grid covered one books-shaped synthetic
dataset.  This driver materializes two more latent-mode datasets whose
knobs were calibrated with tools/calibrate_regimes.py to land in the
reference's dense and zno recall bands, then runs the full experiment
grid on each via tools/run_experiments.py, writing
``exp_synth_dense/`` and ``exp_synth_zno/`` with the reference artifact
layout.

Unlike the books grid, these datasets derive their content-embedding
matrix from the true item factors (informative_item_embeddings,
noise tuned per regime) and cluster brands in taste space
(latent_cluster_brands) — so the emb/fus/brd variants can show the
qualitative orderings the reference's real-metadata runs show, instead
of being pure-noise features.

Run on the TPU host:
    python tools/run_regime_grids.py                 # both regimes
    python tools/run_regime_grids.py --regime dense  # one
    python tools/run_regime_grids.py --regime zno --epochs 150
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.calibrate_regimes import REGIMES  # noqa: E402

# Content-embedding noise per regime, chosen to match the DIRECTION of
# the reference's own emb/fus effects (tools/regime_comparison.py reads
# the committed reference CSVs):
#   dense (exp/):  emb uplift ~ +0.0004 (≈0) and Fusion strongly negative
#                  (best 0.625 vs 0.662, final collapse to 0.536) — the
#                  content signal adds nothing there, so noise is high;
#   zno (exp_zno/): no emb/fus reference runs exist; weakly informative.
#   sport (exp_sport/): the only reference run IS a Fusion run in the
#                  0.045-0.05 band — weakly informative content.
#   books (exp_synth/): round-4 TPU probes at noise {1.0, 0.5, 0.2}:
#                  emb uplift +0.0035/+0.0027/+0.0056 (reference
#                  +0.0085) — 0.2 chosen; fus peaks ≈ emb then
#                  collapses at this dataset scale (fusion-layer
#                  overfit), unlike the reference's held fus > emb —
#                  documented in REGIMES.md rather than tuned away.
#   round-5 dense change (VERDICT r4 next #2): content switches from
#   high-noise informative to MISLEADING (emb_style='mislead' in the
#   regime dict): row-permuted item factors projected like informative
#   content — strong, internally consistent, taste-unrelated.  Purely
#   noisy content cannot reproduce the reference's dense Fusion
#   collapse (0.6255 -> 0.5364) because the fusion Linear just learns
#   to ignore noise; misleading content actively fights the converged
#   dense taste.  The emb-INIT variant can still unlearn a bad init by
#   convergence (now ep~135), matching the reference's ~0 emb uplift.
EMB_NOISE = {"dense": 0.5, "zno": 1.5, "sport": 1.5, "books": 0.2}
# Brand assignment stays random in both regimes: every reference dataset
# shows |brand - no_brand| < 0.001 best-R@20 (within its own duplicate
# -run variance band), which uncorrelated brands reproduce; latent
# -clustered brands (data/synthetic.py::latent_cluster_brands) would
# manufacture a positive delta the reference does not have.
BRAND_STYLE = "random"


def dataset_dir(regime: str, core: int = 16) -> str:
    # the books regime predates this driver; its grid (exp_synth/) was
    # run against dataset/synthetic_grid (see exp_synth/README.md)
    name = "synthetic_grid" if regime == "books" else f"synthetic_{regime}"
    return os.path.join(REPO, "dataset", name, f"processed_data_{core}")


def generate(regime: str, core: int = 16, seed: int = 42,
             emb_noise: float = None) -> str:
    from gcn_recommendation_tpu.data.synthetic import generate_synthetic_dataset

    spec = REGIMES[regime]
    out = dataset_dir(regime, core)
    generate_synthetic_dataset(
        out,
        num_users=spec["num_users"],
        num_items=spec["num_items"],
        num_brands=spec["num_brands"],
        mean_degree=spec["mean_degree"],
        core=core,
        seed=seed,
        embedding_dim=64,
        style="latent",
        latent_dim=spec["latent_dim"],
        temperature=spec["temperature"],
        pop_scale=spec.get("pop_scale", 0.5),
        emb_noise=EMB_NOISE[regime] if emb_noise is None else emb_noise,
        brand_style=BRAND_STYLE,
        split=spec.get("split", "random"),
        pop_df=spec.get("pop_df"),
        pop_zipf=spec.get("pop_zipf"),
        deg_sigma=spec.get("deg_sigma", 0.5),
        spectrum=spec.get("spectrum", 0.0),
        emb_style=spec.get("emb_style", "informative"),
        rank_key=spec.get("rank_key", "full"),
    )
    print(f"[{regime}] dataset written to {out}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", choices=["dense", "zno", "sport", "books"],
                    default=None, help="Default: dense+zno.")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--core", type=int, default=16)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--grids", type=str, default="base,loss,lase",
                    help="Passed through to run_experiments.py.")
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--emb_noise", type=float, default=None,
                    help="Override the regime's content-embedding noise "
                         "(interactions are unaffected — base codes stay "
                         "valid across emb_noise settings).")
    args = ap.parse_args()

    regimes = [args.regime] if args.regime else ["dense", "zno"]
    for regime in regimes:
        processed = generate(regime, core=args.core, seed=args.seed,
                             emb_noise=args.emb_noise)

        # books artifacts live in exp_synth/ (the pre-driver grid dir
        # regime_comparison.py reads); other regimes in exp_synth_<name>
        exp_name = "exp_synth" if regime == "books" else f"exp_synth_{regime}"

        def run_grid(grids: str, only, seed: int):
            cmd = [
                sys.executable,
                os.path.join(REPO, "tools", "run_experiments.py"),
                "--processed_dir", processed,
                "--exp_name", os.path.join(REPO, exp_name),
                "--epochs", str(args.epochs),
                "--core", str(args.core),
                "--grids", grids,
                "--seed", str(seed),
            ]
            if only:
                cmd += ["--only", only]
            print(f"[{regime}] running grid: {' '.join(cmd)}", flush=True)
            subprocess.run(cmd, check=True)

        wanted = args.grids.split(",")
        main_grids = ",".join(g for g in wanted if g != "lase")
        if main_grids:
            run_grid(main_grids, args.only, args.seed)
        if "lase" in wanted:
            # the reference's lase_* dirs are duplicate-config reruns of
            # base brd/nob differing only by RNG (exp_zno) — use seed+1
            run_grid("lase", args.only or "brd,nob", args.seed + 1)


if __name__ == "__main__":
    main()
