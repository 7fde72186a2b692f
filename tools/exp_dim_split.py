"""Map the gather knee across (source rows x row width) for the
feature-split question.

PERF.md established the knee on ROW COUNT at d<=128 (~2.5 ns/row under
~200k rows, ~5.2 above) and a lane penalty at d=256 (3.61 ns/row at
72k rows, ~9.4 at 720k).  Chunking at d=256 measured SLOWER end-to-end
than plain — but that test kept gathers 256 lanes wide.  The untested
alternative is FEATURE SPLITTING: A @ [E1|E2] = [A@E1 | A@E2], so a
d=256 propagation can run as two d=128 halves whose chunked sub-knee
gathers are the known-good fast path.

This measures raw gather rates at rows x dim combinations so the
decision math is grounded:

* d=256 per 256-wide row-equivalent, candidate formulations:
  - plain 720k x 256 gather            (status quo for big graphs)
  - 2 gathers from 720k x 128 halves   (split, no chunking)
  - 2 gathers from 180k x 128 slices   (split + source chunking)
  - 1 gather  from 180k x 256 slices   (chunking only — the rejected one)

Timing per PERF.md: chained scan, one fetch at the end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROWS_PER_ITER = 4_000_000
CHAIN = 20


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def time_gather(src_rows: int, d: int, label: str):
        emb0 = jnp.asarray(rng.standard_normal((src_rows, d)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, src_rows, ROWS_PER_ITER, dtype=np.int64).astype(np.int32)
        )

        @jax.jit
        def chain(emb, idx):
            def body(e, _):
                out = jnp.take(e, idx, axis=0)          # [R, d]
                # serialize iterations through a single-row dependency so
                # the chained gathers can't be CSE'd, without paying a
                # full-table rewrite per iteration
                e = e.at[0].add(out[0] * 1e-12)
                return e, None

            e, _ = jax.lax.scan(body, emb, None, length=CHAIN)
            return jnp.sum(e)

        t0 = time.perf_counter()
        _ = float(chain(emb0, idx))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(chain(emb0, idx))
            best = min(best, time.perf_counter() - t0)
        ns_row = best / CHAIN / ROWS_PER_ITER * 1e9
        print(
            f"{label:28s} rows={src_rows/1e3:6.0f}k d={d:3d}: "
            f"{ns_row:5.2f} ns/gathered-row  (compile+first {compile_s:.0f}s)",
            flush=True,
        )
        return ns_row

    rates = {}
    for rows in (90_000, 180_000, 360_000, 720_000):
        for d in (128, 256):
            rates[(rows, d)] = time_gather(rows, d, "gather")

    print("\nPer 256-wide destination-row-equivalent (gather cost only):")
    print(f"  plain   720k x 256          : {rates[(720_000, 256)]:5.2f} ns")
    print(f"  split   2 x (720k x 128)    : {2 * rates[(720_000, 128)]:5.2f} ns")
    print(f"  split+chunk 2 x (180k x 128): {2 * rates[(180_000, 128)]:5.2f} ns")
    print(f"  chunk-only   180k x 256     : {rates[(180_000, 256)]:5.2f} ns")
    print("(chunked forms add the measured d-proportional merge overhead —")
    print(" PERF.md 'chunking loses at wide dims' — so a split+chunk win")
    print(" must clear plain by more than the d=128 merge cost x2.)")


if __name__ == "__main__":
    main()
