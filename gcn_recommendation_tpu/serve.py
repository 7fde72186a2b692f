"""Retrieval serving: precomputed embeddings -> top-k recommendations.

The reference has no serving path — retrieval exists only inside
evaluate() (main.py:404-439).  This module packages the same scoring
semantics behind a serving API:

* one propagation at load time (embeddings are static between model
  updates — main.py:413's "propagate once per eval" taken to its
  conclusion);
* ``recommend(user_ids, k)`` — masked full-catalog top-k per user batch,
  with the user's train-seen items filtered exactly like evaluation;
* optional int8 item table (``quantize=True``): 4x smaller catalog
  footprint via the Pallas stochastic-rounding quantizer, scores on the
  MXU int8 path (ops/quant.py; ~98% top-20 agreement with f32).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.data.loader import DataBundle
from gcn_recommendation_tpu.data.sampler import membership_arrays, padded_filter_rows
from gcn_recommendation_tpu.ops.quant import quantize_rows_int8, quantized_topk_scores
from gcn_recommendation_tpu.ops.spmm import to_device_graph_auto
from gcn_recommendation_tpu.ops.topk import masked_topk_scores

# One jitted dispatch per request (user-row gather + score + mask + top-k
# fused): each separate dispatch pays a full tunnel round trip, and the
# eager call additionally materialized the [B, F, N] comparison mask
# through HBM instead of fusing it into the top-k.
@functools.partial(jax.jit, static_argnames=("k",))
def _serve_topk_f32(user_emb, users, item_emb, filt, k):
    u = jnp.take(user_emb, users, axis=0)
    return masked_topk_scores(u, item_emb, filt, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _serve_topk_int8(user_emb, users, item_q, item_scale, filt, k):
    u = jnp.take(user_emb, users, axis=0)
    return quantized_topk_scores(u, item_q, item_scale, filt, k)


def _bucket_up(n: int, floor: int, mult: int = 4) -> int:
    """Smallest floor * mult^j >= n — request shapes land on a small
    geometric ladder so repeated serving calls reuse compiled programs
    instead of retracing per exact (batch, filter-width) pair."""
    b = floor
    while b < n:
        b *= mult
    return b


class Retriever:
    """Top-k recommendation over a trained model's final embeddings."""

    def __init__(
        self,
        user_emb: jax.Array,
        item_emb: jax.Array,
        bundle: DataBundle,
        quantize: bool = False,
        mesh=None,
    ):
        """``mesh``: an optional ('data','model') jax.sharding.Mesh — the
        item catalog is then row-sharded over the model axis and every
        ``recommend`` call scores through the distributed local-top-k +
        all-gather merge (parallel/spmd.py::sharded_topk_eval_batch), so
        catalogs too large for one chip's HBM can still serve.  Composes
        with ``quantize``: the int8 table and its row scales are
        row-sharded the same way and scored per shard
        (spmd.py::sharded_quantized_topk_batch)."""
        self.mesh = mesh
        self.num_items = int(item_emb.shape[0])
        self.quantized = quantize
        if quantize:
            if mesh is not None:
                # quantize AFTER sharding (round-4 ADVICE): the f32
                # catalog is row-sharded first and each device quantizes
                # only its own shard, so the int8 table + scales never
                # materialize whole on one chip.  (The f32 catalog
                # itself arrives as the propagation output, so its
                # load-time residency is set upstream by how the forward
                # pass was sharded.)  Pad rows are all-zero -> the
                # kernel's absmax guard gives them a ~1e-14 scale and
                # zero codes; they are index-masked at top-k anyway.
                from jax.sharding import NamedSharding, PartitionSpec as P

                from gcn_recommendation_tpu.core.mesh import MODEL_AXIS
                from gcn_recommendation_tpu.parallel.spmd import pad_rows

                n_model = mesh.shape[MODEL_AXIS]
                sharded = NamedSharding(mesh, P(MODEL_AXIS, None))
                item_pad = jax.device_put(
                    jnp.asarray(pad_rows(np.asarray(item_emb), n_model * 8)),
                    sharded,
                )
                qfn = jax.shard_map(
                    quantize_rows_int8,
                    mesh=mesh,
                    in_specs=P(MODEL_AXIS, None),
                    out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None)),
                )
                self.item_q, self.item_scale = jax.jit(qfn)(item_pad)
                user_emb = jax.device_put(
                    jnp.asarray(user_emb), NamedSharding(mesh, P())
                )
            else:
                self.item_q, self.item_scale = quantize_rows_int8(item_emb)
            self.item_emb = None
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gcn_recommendation_tpu.core.mesh import MODEL_AXIS
            from gcn_recommendation_tpu.parallel.spmd import pad_rows

            n_model = mesh.shape[MODEL_AXIS]
            item_pad = pad_rows(np.asarray(item_emb), n_model * 8)
            self.item_emb = jax.device_put(
                jnp.asarray(item_pad), NamedSharding(mesh, P(MODEL_AXIS, None))
            )
            user_emb = jax.device_put(
                jnp.asarray(user_emb), NamedSharding(mesh, P())
            )
        else:
            self.item_emb = item_emb
        self.user_emb = user_emb
        # seen-item filter: the user's train interactions
        f_ptr, f_items = membership_arrays(
            bundle.train.user_idx, bundle.train.item_idx, bundle.num_users
        )
        self._f_ptr, self._f_items = f_ptr, f_items
        self._deg = f_ptr[1:] - f_ptr[:-1]

    @classmethod
    def from_params(
        cls, model, params, bundle: DataBundle, quantize: bool = False, mesh=None
    ):
        """Propagate once and build a retriever from trained params.

        The graph is built in the model's propagation storage dtype so
        serving scores match the training-time validation scores up to
        float summation order (the trainer's fused merge-skip layout
        sums in permuted column order; serving uses the per-layer
        layout, so near-exact-tie top-k entries may reorder)."""
        graph = to_device_graph_auto(
            bundle.graph,
            compute_dtype=jnp.dtype(getattr(model, "compute_dtype", "float32")),
            embedding_dim=getattr(model, "embedding_dim", 64),
            # serving propagates exactly once at load time — skip the
            # merge-skip permuted views and their ~2x graph residency
            fuse_layers=False,
        )
        fu, fi, *_ = model.apply(params, graph)
        return cls(fu, fi, bundle, quantize=quantize, mesh=mesh)

    def _filter_batch(self, users: np.ndarray, filter_seen: bool) -> np.ndarray:
        """[B_pad, F] padded seen-item lists at bucketed width.

        Width is bucketed to a geometric ladder capped at the global max
        seen-count (exact per-request widths retraced the jitted top-k on
        nearly every distinct user set — compile latency dominates on the
        remote-tunnel TPU)."""
        b = len(users)
        if not filter_seen:
            return np.full((b, 1), self.num_items, np.int32)
        lens = self._deg[users]
        fmax = max(1, int(lens.max()) if b else 1)
        global_max = max(1, int(self._deg.max())) if len(self._deg) else 1
        fmax = min(_bucket_up(fmax, 8), global_max)
        return padded_filter_rows(
            self._f_ptr, self._f_items, users, fmax, self.num_items
        )

    def _dispatch(self, user_ids, k: int, filter_seen: bool):
        """Enqueue one masked top-k dispatch; returns DEVICE arrays plus
        the true request size.  JAX dispatch is asynchronous, so callers
        may enqueue many of these before fetching any result — that is
        what lets the pipelined/batched serving paths overlap the
        per-call tunnel round trip (PERF.md "Serving latency": ~5 ms of
        device compute under ~80-90 ms of RTT+dispatch)."""
        users = np.asarray(user_ids, dtype=np.int32)
        n_req = len(users)
        # pad the batch onto the shape ladder too (repeat user 0; sliced off)
        b_pad = _bucket_up(max(n_req, 1), 8, 2)
        users_pad = np.zeros(b_pad, np.int32)
        users_pad[:n_req] = users
        filt = jnp.asarray(self._filter_batch(users_pad, filter_seen))
        users_d = jnp.asarray(users_pad)
        if self.quantized and self.mesh is not None:
            from gcn_recommendation_tpu.parallel.spmd import (
                sharded_quantized_topk_batch,
            )

            u = jnp.take(self.user_emb, users_d, axis=0)
            vals, idx = sharded_quantized_topk_batch(
                self.mesh, u, self.item_q, self.item_scale, filt, k,
                num_valid_items=self.num_items,
            )
        elif self.quantized:
            vals, idx = _serve_topk_int8(
                self.user_emb, users_d, self.item_q, self.item_scale, filt, k
            )
        elif self.mesh is not None:
            from gcn_recommendation_tpu.parallel.spmd import (
                sharded_topk_eval_batch,
            )

            u = jnp.take(self.user_emb, users_d, axis=0)
            vals, idx = sharded_topk_eval_batch(
                self.mesh, u, self.item_emb, filt, k,
                num_valid_items=self.num_items,
            )
        else:
            vals, idx = _serve_topk_f32(
                self.user_emb, users_d, self.item_emb, filt, k
            )
        return vals, idx, n_req

    def recommend(
        self,
        user_ids,
        k: int = 20,
        filter_seen: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (scores, item_ids), each [len(user_ids), k]."""
        vals, idx, n_req = self._dispatch(user_ids, k, filter_seen)
        return np.asarray(vals)[:n_req], np.asarray(idx)[:n_req]

    def recommend_pipelined(
        self,
        requests,
        k: int = 20,
        filter_seen: bool = True,
    ):
        """Serve a list of independent requests, overlapping their device
        round trips: every request is DISPATCHED before any result is
        fetched, so the tunnel RTT is paid once per pipeline drain
        instead of once per request.  Per-request latency is unchanged;
        aggregate throughput approaches the device-compute bound
        (tools/exp_serve.py publishes QPS vs pipeline depth).

        ``requests``: iterable of user-id lists.  Returns a list of
        (scores, item_ids) pairs in request order.
        """
        inflight = [self._dispatch(u, k, filter_seen) for u in requests]
        return [
            (np.asarray(v)[:n], np.asarray(i)[:n]) for v, i, n in inflight
        ]

    def recommend_many(
        self,
        requests,
        k: int = 20,
        filter_seen: bool = True,
    ):
        """Micro-batched serving: coalesce a list of requests into ONE
        device dispatch (one user batch on the shape ladder), then split
        the results back per request.  The highest-throughput path when
        a frontend can accumulate requests for a few milliseconds —
        amortizes the whole RTT + dispatch overhead across the batch.

        ``requests``: iterable of user-id lists.  Returns a list of
        (scores, item_ids) pairs in request order.
        """
        sizes = [len(np.atleast_1d(u)) for u in requests]
        if not sizes:
            return []
        users = np.concatenate(
            [np.atleast_1d(np.asarray(u, np.int32)) for u in requests]
        )
        vals, idx = self.recommend(users, k, filter_seen)
        out, off = [], 0
        for s in sizes:
            out.append((vals[off : off + s], idx[off : off + s]))
            off += s
        return out
