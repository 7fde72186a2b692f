"""Pin the gather-knee position at d=192 (fractional lane-tile width).

The tile model (PERF.md "gather knee", ops/spmm.py::knee_rows_for) says
the fast region ends at ~22.5k (sublane x 128-lane) tiles with
ceil(d/128) lane-tiles per row.  d=192 is the interesting probe: rows
carry 1.5 lane-tiles of *data* but ceil() charges 2 — so the knee lands
at 90k rows if XLA pads the lane dimension to 256, or at ~120k rows
(22.5k x 8 / 1.5) if fractional tiles count.  knee_rows_for currently
uses ceil (conservative).

Timing per PERF.md: chained scan, one fetch at the end
(block_until_ready is a no-op on the axon tunnel).
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

    def time_gather(src_rows: int, d: int):
        emb0 = jnp.asarray(rng.standard_normal((src_rows, d)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, src_rows, ROWS_PER_ITER, dtype=np.int64).astype(np.int32)
        )

        @jax.jit
        def chain(emb, idx):
            def body(e, _):
                out = jnp.take(e, idx, axis=0)
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
        tiles_ceil = (src_rows // 8) * -(-d // 128)
        tiles_frac = (src_rows // 8) * d / 128
        print(
            f"rows={src_rows/1e3:6.0f}k d={d}: {ns_row:5.2f} ns/row  "
            f"tiles ceil={tiles_ceil/1e3:6.1f}k frac={tiles_frac/1e3:6.1f}k"
            f"  (compile {compile_s:.0f}s)",
            flush=True,
        )
        return ns_row

    for rows in (60_000, 90_000, 120_000, 150_000, 180_000, 240_000):
        time_gather(rows, 192)


if __name__ == "__main__":
    main()
