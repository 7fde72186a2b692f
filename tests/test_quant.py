"""Quantized retrieval tests (Pallas kernel in interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.ops.quant import (
    ROW_BLOCK,
    quantize_rows_int8,
    quantize_rows_int8_pallas,
    quantized_topk_scores,
)
from gcn_recommendation_tpu.ops.topk import masked_topk_scores


def test_pallas_quantizer_interpret_roundtrip():
    # NOTE: the Mosaic interpreter's prng_random_bits returns zeros, so
    # this covers the kernel structure and the <=1-step error bound;
    # stochasticity itself is validated on real TPU (tools/tpu_checks.py).
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROW_BLOCK * 2, 64)).astype(np.float32))
    q, s = quantize_rows_int8_pallas(x, seed=1, interpret=True)
    assert q.dtype == jnp.int8 and s.shape == (x.shape[0], 1)
    deq = q.astype(jnp.float32) * s
    # rounding error bounded by one quantization step per element
    err = jnp.abs(deq - x)
    assert float(jnp.max(err / jnp.maximum(s, 1e-12))) <= 1.0 + 1e-3


def test_pallas_quantizer_deterministic_per_seed():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((ROW_BLOCK, 32)).astype(np.float32))
    q1, _ = quantize_rows_int8_pallas(x, seed=7, interpret=True)
    q2, _ = quantize_rows_int8_pallas(x, seed=7, interpret=True)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_fallback_quantizer_pads_and_trims():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((100, 16)).astype(np.float32))  # non-multiple
    q, s = quantize_rows_int8(x, use_pallas=False)
    assert q.shape == (100, 16) and s.shape == (100, 1)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(deq, np.asarray(x), atol=float(s.max()) * 0.51)


def test_quantized_topk_matches_f32_ranking():
    rng = np.random.default_rng(3)
    B, I, d, k = 64, 500, 64, 20
    u = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((I, d)).astype(np.float32))
    filt = jnp.full((B, 4), I, jnp.int32)
    q, s = quantize_rows_int8(items, use_pallas=False)

    _, idx_q = quantized_topk_scores(u, q, s, filt, k)
    _, idx_f = masked_topk_scores(u, items, filt, k)
    # int8 quantization perturbs near-ties; require high top-k overlap
    overlap = np.mean(
        [
            len(set(np.asarray(idx_q[b]).tolist()) & set(np.asarray(idx_f[b]).tolist()))
            / k
            for b in range(B)
        ]
    )
    assert overlap > 0.9, overlap
