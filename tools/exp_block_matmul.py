"""Experiment: block-sparse MXU propagation — component costs on TPU.

tools/exp_block_density.py showed degree-sorting concentrates ~71% of
bench-graph edges into 5.8k qualifying 128x128 tiles (mean fill 184).
This measures what the block path actually costs at that shape, XLA-only:

  g    = E_blocks[tile_col]                  # [T, 128, 64] block gather
  prod = batched_matmul(tile_a, g)           # [T, 128, 128] @ [T, 128, 64]
  out  = prod.reshape(R, m, 128, 64).sum(1)  # per-row-block reduction

vs the equivalent row-gather cost (~2.2-2.4 ns per covered edge).

Run on the TPU host:  python tools/exp_block_matmul.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_BLOCKS = 564          # 72k nodes / 128
D = 64
CHAIN = 30


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        _ = float(np.asarray(f(*args)).ravel()[0])
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*args)).ravel()[0])
        dt = (time.perf_counter() - t0) / CHAIN
        print(f"{name:28s} {dt*1e3:7.3f} ms", flush=True)
        return dt

    for m, r_blocks in ((16, 384), (32, 192)):
        t = m * r_blocks  # total tile slots
        covered_edges = int(t * 184 * 0.8)  # ~mean fill, 20% slot padding
        print(f"--- T={t} tiles ({m} per row-block x {r_blocks} row-blocks), "
              f"~{covered_edges/1e6:.2f}M covered edges ---", flush=True)
        e = jnp.asarray(rng.standard_normal((N_BLOCKS * 128, D)).astype(np.float32))
        tile_a = jnp.asarray(
            (rng.standard_normal((t, 128, 128)) * 0.01).astype(np.float32)
        )
        tile_col = jnp.asarray(rng.integers(0, N_BLOCKS, t).astype(np.int32))

        def chain(body):
            def fn(e, tile_a, tile_col):
                def step(carry, _):
                    return body(carry, tile_a, tile_col), None
                c, _ = jax.lax.scan(step, e, None, length=CHAIN)
                return jnp.sum(c)
            return fn

        def gather_only(e, tile_a, tile_col):
            g = jnp.take(e.reshape(N_BLOCKS, 128 * D), tile_col, axis=0)
            out = jnp.sum(g.reshape(t, 128, D), axis=0)  # [128, D] — forces the gather
            return e + jnp.tile(out / t, (N_BLOCKS, 1)) * 1e-12

        def gather_matmul(e, tile_a, tile_col):
            g = jnp.take(e.reshape(N_BLOCKS, 128 * D), tile_col, axis=0).reshape(t, 128, D)
            prod = jnp.einsum("tij,tjd->tid", tile_a, g,
                              preferred_element_type=jnp.float32)
            out = jnp.sum(prod, axis=0)
            return e + jnp.tile(out / t, (N_BLOCKS, 1)) * 1e-12

        def full(e, tile_a, tile_col):
            g = jnp.take(e.reshape(N_BLOCKS, 128 * D), tile_col, axis=0).reshape(t, 128, D)
            prod = jnp.einsum("tij,tjd->tid", tile_a, g,
                              preferred_element_type=jnp.float32)
            red = prod.reshape(r_blocks, m, 128, D).sum(1)      # [R, 128, D]
            out = red.reshape(r_blocks * 128, D)
            pad = N_BLOCKS * 128 - r_blocks * 128
            return e + jnp.concatenate([out, jnp.zeros((pad, D), out.dtype)]) * 1e-12

        def full_bf16(e, tile_a, tile_col):
            g = jnp.take(e.reshape(N_BLOCKS, 128 * D), tile_col, axis=0).reshape(t, 128, D)
            prod = jnp.einsum(
                "tij,tjd->tid",
                tile_a.astype(jnp.bfloat16),
                g.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            red = prod.reshape(r_blocks, m, 128, D).sum(1)
            out = red.reshape(r_blocks * 128, D)
            pad = N_BLOCKS * 128 - r_blocks * 128
            return e + jnp.concatenate([out, jnp.zeros((pad, D), out.dtype)]) * 1e-12

        timed("block gather only", chain(gather_only), e, tile_a, tile_col)
        timed("gather + batched matmul", chain(gather_matmul), e, tile_a, tile_col)
        timed("full (gather+mm+reduce)", chain(full), e, tile_a, tile_col)
        timed("full, bf16 tiles", chain(full_bf16), e, tile_a, tile_col)
        print(f"(row-gather equivalent: {covered_edges * 2.4e-6:.2f} ms; "
              f"A-tile HBM read floor f32: {t * 65536 / 820e9 * 1e3:.3f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
