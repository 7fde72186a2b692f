"""Quantized retrieval: int8 item embeddings for serving top-k.

No reference counterpart (the reference serves f32 scores, main.py:420);
this is a TPU-native serving feature: the item table is quantized to
int8 with per-row scales, halving (vs bf16) or quartering (vs f32) the
table's HBM footprint and letting the score matmul run on the MXU's int8
path.

* ``quantize_rows_int8`` — a Pallas TPU kernel: per-row absmax scaling
  with **stochastic rounding** from the on-core PRNG (the canonical
  Pallas quantization pattern; stochastic rounding is not expressible in
  plain XLA).  Grid over row blocks; everything stays in VMEM.
* ``quantized_topk_scores`` — int8 x int8 MXU matmul with s32
  accumulation, per-row rescale, seen-item masking and top-k; drop-in
  for ops.topk.masked_topk_scores on the serving path.

Falls back to a pure-JAX quantizer (round-to-nearest) off-TPU so tests
run on CPU; the Pallas kernel itself is additionally covered in
interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gcn_recommendation_tpu.ops.topk import masked_topk

ROW_BLOCK = 256


def _quant_kernel(seed_ref, x_ref, q_ref, scale_ref):
    from jax.experimental.pallas import tpu as pltpu

    # per-core PRNG; fold in the row-block id so blocks draw distinct bits
    import jax.experimental.pallas as pl

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    scaled = x / scale
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # stochastic rounding from raw bits: floor(x + U[0,1)) — unbiased, and
    # unlike pltpu.stochastic_round it also runs under the interpreter.
    # Use the top 24 bits via a logical shift so the uniform stays in
    # [0,1) regardless of signed reinterpretation.
    # (Mosaic cannot cast uint32->f32 directly; the top-24-bit value fits
    # in int32, so reinterpret first.)
    top24 = pltpu.bitcast(
        jax.lax.shift_right_logical(bits, jnp.uint32(8)), jnp.int32
    )
    u01 = top24.astype(jnp.float32) * (1.0 / 16777216.0)
    rounded = jnp.floor(scaled + u01)
    q_ref[:] = jnp.clip(rounded, -127.0, 127.0).astype(jnp.int8)
    scale_ref[:] = scale


def quantize_rows_int8_pallas(
    x: jax.Array, seed: int = 0, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Pallas row-wise int8 quantization with stochastic rounding.

    x: [N, d] float32 (N padded to ROW_BLOCK by the wrapper below).
    Returns (q int8 [N, d], scales f32 [N, 1]).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    assert n % ROW_BLOCK == 0
    grid = (n // ROW_BLOCK,)
    seed_arr = jnp.asarray([seed], dtype=jnp.int32)
    # the generic HLO interpreter lacks the TPU PRNG primitives; use the
    # Mosaic TPU interpreter for off-TPU testing
    interp = pltpu.InterpretParams() if interpret else False
    q, scales = pl.pallas_call(
        _quant_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((ROW_BLOCK, d), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((ROW_BLOCK, d), lambda i, *_: (i, 0)),
                pl.BlockSpec((ROW_BLOCK, 1), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interp,
    )(seed_arr, x)
    return q, scales


def quantize_rows_int8(
    x: jax.Array, seed: int = 0, use_pallas: bool = True
) -> Tuple[jax.Array, jax.Array]:
    """Row-wise int8 quantization; Pallas on TPU, round-to-nearest JAX
    fallback elsewhere.  Pads rows to ROW_BLOCK internally."""
    n, d = x.shape
    n_pad = -(-n // ROW_BLOCK) * ROW_BLOCK
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if use_pallas and on_tpu:
        q, s = quantize_rows_int8_pallas(xp, seed)
    else:
        absmax = jnp.max(jnp.abs(xp), axis=1, keepdims=True)
        s = jnp.maximum(absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(xp / s), -127, 127).astype(jnp.int8)
    return q[:n], s[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def quantized_topk_scores(
    user_emb_batch: jax.Array,  # [B, d] f32
    item_q: jax.Array,          # [I, d] int8
    item_scale: jax.Array,      # [I, 1] f32
    filter_idx: jax.Array,      # [B, F] padded with I
    k: int,
):
    """Masked top-k over an int8-quantized item table.

    The user side is quantized dynamically per batch so the matmul runs
    int8 x int8 -> s32 on the MXU; scores are rescaled to f32 with the
    outer product of the two scale vectors before masking/top-k.
    """
    u_absmax = jnp.max(jnp.abs(user_emb_batch), axis=1, keepdims=True)
    u_scale = jnp.maximum(u_absmax, 1e-12) / 127.0
    u_q = jnp.clip(jnp.round(user_emb_batch / u_scale), -127, 127).astype(jnp.int8)
    s32 = jax.lax.dot_general(
        u_q,
        item_q,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = s32.astype(jnp.float32) * u_scale * item_scale[:, 0][None, :]
    return masked_topk(scores, filter_idx, k)
