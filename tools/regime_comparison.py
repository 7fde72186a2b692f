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

What matches: every regime's absolute recall band (dense 0.645-0.665 vs
0.662; books 0.094 vs 0.087; sport 0.052 vs 0.050; zno 0.0578-0.0584 vs
0.0576-0.0618), the books emb-init uplift sign and scale, the books and
zno brand-delta ≈ 0, and the sport Fusion early peak epoch.  What does
not, with the attribution:

1. **Post-peak decay in the sparse synthetic regimes.**  Our sparse
   curves (books, sport, zno) peak by epoch 15-70 and then decay, where
   the reference's real-data runs climb to ~ep135 and hold.  The decay
   is worst for LightGCN_Fusion (the fusion Linear memorizes fastest):
   books fus holds 0.47, sport 0.37.  *Measured attribution*: raw
   dataset size is NOT the cause — a 2x-scale books rerun (20k users /
   10k items, same density) left the holds unchanged (nob 0.87 vs 0.92,
   fus 0.46 vs 0.48).  The decay tracks the interaction DENSITY
   (examples/parameter ≈ mean_degree / (2·dim) ≈ 0.2 here, independent
   of size) and the light-tailed latent interaction model; the
   reference's real dumps have heavier-tailed degree structure and
   test items drawn from more stationary preferences.  Raising density
   to fix the shape would move every calibrated recall band; the bands
   and orderings are the transferable signal.
2. **Books: Fusion peaks ≈ emb instead of above it.**  Reference books:
   fus 0.1015 > emb 0.0951 > base 0.0866, all holding.  Ours: emb
   0.0996 > fus 0.0969 > base 0.0940.  TPU probes at content noise
   {1.0, 0.5, 0.2} moved emb (+0.0035/+0.0027/+0.0056) but fus stayed
   ≈ emb - 0.002 — its peak is capped by the early-epoch dynamics
   before the collapse of (1) sets in, so more content signal accrues
   to the emb-init variant instead.
3. **Dense: emb/fus uplifts are positive (+0.010..0.015) where the
   reference's are ≈0/negative.**  A convergence-speed artifact, not a
   content effect — *measured directly*: (a) a noise-10 probe (content
   ≈ pure noise) reproduced the same +0.013 "uplift"; (b) extending the
   same two runs to 300 epochs converges them to the SAME ceiling —
   nob best 0.6703 (ep265) vs nob_emb 0.6708 (ep255), delta +0.0005,
   the reference's own +0.0004, with identical ep300 finals (0.6675).
   Our dense base is simply not converged at the 150-epoch protocol
   cutoff (the reference's converges by ep135), so any init that
   speeds early training shows as fake "uplift" at ep150.  The
   reference's dense Fusion *collapse* (0.625 -> 0.536) needs
   real-metadata content that actively conflicts with dense taste;
   factor-derived synthetic content cannot mislead that way.
4. **Dense brand delta −0.005.**  Duplicate-run spread measured from
   our lase_* reruns is ~0.001, so the delta is real in our synthetic:
   random brand edges smooth item embeddings toward brand means, a mild
   cost in the dense regime.  The reference's dense brands are
   metadata-correlated and score ≈0.
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
