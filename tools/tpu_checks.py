"""Real-TPU validation of the Pallas quantization kernel + quantized serving.

(The Mosaic interpreter's PRNG returns zeros, so stochastic-rounding
properties can only be checked on hardware.)  Run on the TPU host:

    python tools/tpu_checks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gcn_recommendation_tpu.ops.quant import (
        quantize_rows_int8_pallas,
        quantized_topk_scores,
    )
    from gcn_recommendation_tpu.ops.topk import masked_topk_scores

    assert jax.devices()[0].platform in ("tpu", "axon"), "needs TPU"

    rng = np.random.default_rng(0)
    N, D = 20480, 64
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

    q, s = quantize_rows_int8_pallas(x, seed=1)
    q, s = np.asarray(q), np.asarray(s)
    deq = q.astype(np.float32) * s
    step_err = np.abs(deq - np.asarray(x)) / np.maximum(s, 1e-12)
    mean_bias = float(np.mean(deq - np.asarray(x)))
    print(f"max step error: {step_err.max():.4f} (must be <= 1)")
    print(f"mean bias: {mean_bias:.2e} (stochastic rounding -> ~0)")
    assert step_err.max() <= 1.0 + 1e-3
    assert abs(mean_bias) < 5e-4

    q2, _ = quantize_rows_int8_pallas(x, seed=1)
    q3, _ = quantize_rows_int8_pallas(x, seed=2)
    assert (np.asarray(q2) == q).all(), "same seed must reproduce"
    assert (np.asarray(q3) != q).any(), "different seed must differ"
    frac_round_up = float(np.mean(np.asarray(q3) != q))
    print(f"seed determinism ok; {frac_round_up:.1%} of values differ across seeds")

    # quantized vs f32 retrieval agreement
    B, k = 1024, 20
    u = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    filt = jnp.full((B, 8), N, jnp.int32)
    _, idx_q = quantized_topk_scores(u, jnp.asarray(q), jnp.asarray(s), filt, k)
    _, idx_f = masked_topk_scores(u, x, filt, k)
    idx_q, idx_f = np.asarray(idx_q), np.asarray(idx_f)
    overlap = np.mean(
        [len(set(idx_q[b]) & set(idx_f[b])) / k for b in range(B)]
    )
    print(f"top-{k} overlap int8 vs f32: {overlap:.3f}")
    assert overlap > 0.9

    # throughput: chained quantized scoring vs f32 scoring
    sq = jnp.asarray(s)
    qd = jnp.asarray(q)

    @jax.jit
    def chain_q(c, n=40):
        def body(c, _):
            _, idx = quantized_topk_scores(u + c * 1e-20, qd, sq, filt, k)
            return jnp.sum(idx[:, 0]).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    @jax.jit
    def chain_f(c, n=40):
        def body(c, _):
            _, idx = masked_topk_scores(u + c * 1e-20, x, filt, k)
            return jnp.sum(idx[:, 0]).astype(jnp.float32) * 1e-12, None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    for name, f in (("int8", chain_q), ("f32", chain_f)):
        _ = float(f(jnp.float32(0)))
        t0 = time.perf_counter()
        _ = float(f(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / 40
        print(f"{name} masked top-k: {dt*1000:.3f} ms / {B} users "
              f"({B/dt:,.0f} QPS)")

    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
