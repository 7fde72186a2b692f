"""Experiment: seen-item masking strategies for full-catalog top-k (TPU).

The eval pipeline (ops/topk.py) masks each user's train items to -1e10
before lax.top_k.  The production path is a batched scatter; PERF.md
measured it at ~0.85 ms of the 1.5 ms eval batch at F=8 — over half the
budget.  Candidates, all exact-equivalent:

  scatter   scores.at[rows, filt].set(-1e10, mode='drop')   (current)
  compare   mask = any(filt == iota) over F, jnp.where      (O(B*F*I))
  fixup     top_k(k+F) on raw scores, mark seen entries in the short
            list by comparison, re-top_k(k)                 (O(B*(k+F)*F))

Fixup intuition: removing <=F seen items from the top (k+F) leaves >=k
unseen entries, so the final top-k is identical to full masking.

Run on the TPU host:  python tools/exp_topk_mask.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, I, D, K = 1024, 20_000, 64, 20
CHAIN = 40


def main():
    import jax
    import jax.numpy as jnp

    MASK = -1e10

    def mask_scatter(scores, filt):
        rows = jnp.arange(B, dtype=filt.dtype)[:, None]
        s = scores.at[rows, filt].set(MASK, mode="drop")
        return jax.lax.top_k(s, K)

    def mask_compare(scores, filt):
        iota = jnp.arange(I, dtype=filt.dtype)
        seen = jnp.any(filt[:, :, None] == iota[None, None, :], axis=1)
        return jax.lax.top_k(jnp.where(seen, MASK, scores), K)

    def mask_fixup(scores, filt):
        f = filt.shape[1]
        vals, idx = jax.lax.top_k(scores, K + f)
        seen = jnp.any(idx[:, :, None] == filt[:, None, :], axis=-1)
        vals = jnp.where(seen, MASK, vals)
        vals2, order = jax.lax.top_k(vals, K)
        return vals2, jnp.take_along_axis(idx, order, axis=1)

    def nomask(scores, filt):
        return jax.lax.top_k(scores, K)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    it = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))

    for F in (8, 32, 128, 1024):
        filt_np = np.sort(rng.integers(0, I, (B, F)).astype(np.int32), axis=1)
        # ~half the slots padded (pad index = I, dropped/never matching)
        filt_np[:, F // 2 :] = I
        filt = jnp.asarray(filt_np)

        # exactness check vs scatter (compare skipped at wide F: the
        # eager [B, F, I] bool intermediate would exceed HBM)
        scores = jnp.dot(u, it.T)
        ref_v, ref_i = mask_scatter(scores, filt)
        checks = [("fixup", mask_fixup)] + (
            [("compare", mask_compare)] if F <= 128 else []
        )
        for name, fn in checks:
            v, i = fn(scores, filt)
            assert np.array_equal(np.asarray(i), np.asarray(ref_i)), (name, F)
            np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), rtol=1e-6)

        for name, fn in (
            ("scatter", mask_scatter),
            ("compare", mask_compare),
            ("fixup", mask_fixup),
            ("nomask", nomask),
        ):
            if name == "compare" and F >= 512:
                continue  # O(B*F*I) — tens of G compares, pointless

            @jax.jit
            def chain(u, it, filt, fn=fn):
                def body(c, _):
                    sc = jnp.dot(u + c * 1e-20, it.T)
                    _, idx = fn(sc, filt)
                    return jnp.sum(idx[:, 0]).astype(jnp.float32) * 1e-12, None

                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=CHAIN)
                return c

            _ = float(chain(u, it, filt))
            t0 = time.perf_counter()
            _ = float(chain(u, it, filt))
            dt = (time.perf_counter() - t0) / CHAIN
            print(
                f"F={F:5d} {name:8s} {dt * 1e3:7.3f} ms/batch "
                f"({B / dt:,.0f} users/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
