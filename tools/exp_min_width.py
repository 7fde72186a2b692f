"""Experiment: is the ELL gather cost per gathered ROW flat below width 8?

The bucket width schedule floors at 8 (the f32 sublane count), so a
destination with per-chunk degree 1-4 still gathers 8 source rows.  If
the gather issue rate is truly per-row (PERF.md says it is lane-flat up
to 128 and locality-independent), width-1/2/4 buckets would reclaim most
of the chunked layout's padding (1.33x vs the plain 1.20x at stress
scale — the floor is the whole difference).

Measures gather+mul+reduce at widths 1/2/4/8/16 with a FIXED destination
row count, from an under-knee 180k-row source table.  If ms scales ~w,
the per-row model holds and sub-8 buckets win proportionally; if ms is
flat in w below 8, the sublane floor is real and the schedule stays.

Timing per PERF.md: chain iterations through a data dependency inside
one scan dispatch, fetch one scalar.

Run on the TPU host:  python tools/exp_min_width.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SRC_ROWS = 180_000   # under the gather knee
NB = 2_000_000       # destination rows per bucket (stress-scale-ish volume)
DIM = 64
CHAIN = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )

    rng = np.random.default_rng(0)
    emb0 = jnp.asarray(rng.standard_normal((SRC_ROWS, DIM)).astype(np.float32) * 0.1)

    def fused(e, idx, wts):
        return jnp.sum(jnp.take(e, idx, axis=0) * wts[..., None], axis=1)

    def colsum(e, idx, wts):
        # w column-wise width-1 gathers, summed — no [NB, w, d] intermediate
        out = None
        for j in range(idx.shape[1]):
            t = jnp.take(e, idx[:, j], axis=0) * wts[:, j][:, None]
            out = t if out is None else out + t
        return out

    def colT(e, idx, wts):
        # like colsum but idx/wts stored transposed [w, nb]: each column
        # slice is a contiguous row, not a sublane-strided [:, j] slice
        out = None
        for j in range(idx.shape[0]):
            t = jnp.take(e, idx[j], axis=0) * wts[j][:, None]
            t = t.astype(jnp.float32)
            out = t if out is None else out + t
        return out

    def colsum_grouped(e, idx, wts, group=4):
        # width-4 column groups, each forced into its own fusion by an
        # optimization barrier — probes whether the w<=4 colsum rate
        # (1.67 ns/row, ABOVE the flat-gather wall) survives at w>=8
        outs = []
        w = idx.shape[1]
        for g0 in range(0, w, group):
            acc = None
            for j in range(g0, min(g0 + group, w)):
                t = jnp.take(e, idx[:, j], axis=0) * wts[:, j][:, None]
                t = t.astype(jnp.float32)
                acc = t if acc is None else acc + t
            outs.append(jax.lax.optimization_barrier(acc))
        total = outs[0]
        for o in outs[1:]:
            total = total + o
        return total

    def colsum_g2(e, idx, wts):
        return colsum_grouped(e, idx, wts, group=2)

    def time_width(w: int, nb: int, form):
        idx_np = rng.integers(0, SRC_ROWS, size=(nb, w), dtype=np.int64).astype(np.int32)
        wts_np = rng.standard_normal((nb, w)).astype(np.float32) * 1e-3
        if form == "colT":
            idx = jnp.asarray(idx_np.T.copy())
            wts = jnp.asarray(wts_np.T.copy())
        else:
            idx = jnp.asarray(idx_np)
            wts = jnp.asarray(wts_np)
        fn = {
            "fused": fused,
            "colsum": colsum,
            "colT": colT,
            "grp4": colsum_grouped,
            "grp2": colsum_g2,
        }[form]

        @jax.jit
        def chain(emb, idx, wts):
            def body(e, _):
                out = fn(e, idx, wts)
                # feed a slice of the output back so iterations serialize
                e = e + 1e-6 * out[:SRC_ROWS]
                return e, None

            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        t0 = time.perf_counter()
        _ = float(chain(emb0, idx, wts))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(emb0, idx, wts))
            best = min(best, time.perf_counter() - t0)
        per_iter = best / CHAIN
        rows = nb * w
        print(
            f"width {w:3d} nb={nb/1e6:.1f}M {form:6s}: {per_iter*1e3:7.2f} ms/iter  "
            f"{per_iter/rows*1e9:5.2f} ns/gathered-row  "
            f"(compile+first {compile_s:.1f}s)",
            flush=True,
        )
        return per_iter

    for w in (8,):
        for form in ("fused", "colsum", "grp4", "grp2"):
            time_width(w, NB, form)
    # wider buckets at smaller nb (the [nb, w, d] fused intermediate OOMs
    # at nb=2M beyond w=8)
    for w in (16, 32, 64):
        for form in ("fused", "grp4"):
            time_width(w, 500_000, form)


if __name__ == "__main__":
    main()
