"""LightGCN — TPU-native functional implementation.

Behavioral parity with reference models/lightgcn.py:

* three embedding tables (users / items / brands), Xavier-uniform init
  (lightgcn.py:15-31); the item table may be initialized from a pretrained
  matrix whose dim must match (lightgcn.py:18-23);
* forward: concat tables -> K sparse propagations -> mean over the K+1
  layer outputs -> split back (lightgcn.py:40-59);
* returns (final_user, final_item, final_brand, user0, item0) — layer-0
  embeddings feed the L2 regularizer (lightgcn.py:81).

Design differences (TPU-first):

* pure-functional: ``init(key) -> params`` pytree + ``apply(params,
  graph)``; no mutable module state, so the same code runs under jit,
  shard_map, and grad;
* propagation is the scatter-free ELL kernel (ops/spmm.py) and the layer
  mean is computed as a running sum — no K+1-way stack materialization;
* brand nodes are always part of the propagated block, matching the
  reference's fixed num_users+num_items+num_brands layout (lightgcn.py:40).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.ops.spmm import DeviceGraph, propagate


def xavier_uniform(key, shape, dtype=jnp.float32):
    """Xavier/Glorot uniform, matching torch.nn.init.xavier_uniform_
    (bound = sqrt(6 / (fan_in + fan_out)) for a 2-D table)."""
    fan_in, fan_out = shape[0], shape[1]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class LightGCN:
    """Functional LightGCN over the users+items+brands graph."""

    name = "LightGCN"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        num_brands: int,
        config,
        pretrained_item_emb: Optional[np.ndarray] = None,
    ):
        self.num_users = num_users
        self.num_items = num_items
        self.num_brands = num_brands
        # padded table sizes (== logical until set_row_multiple is called)
        self.row_multiple = 1
        self.num_users_pad = num_users
        self.num_items_pad = num_items
        self.num_brands_pad = num_brands
        self.embedding_dim = config.embedding_dim
        self.n_layers = config.n_layers
        self.param_dtype = jnp.dtype(getattr(config, "param_dtype", "float32"))
        # propagation storage dtype: bf16 halves the HBM footprint of the
        # propagated block and the gathered rows (gather rate is dtype-flat,
        # so this buys capacity headroom, not speed — PERF.md); reductions
        # still accumulate in f32 (ops/spmm.py) and the layer mean / loss /
        # optimizer stay f32
        self.compute_dtype = jnp.dtype(getattr(config, "compute_dtype", "float32"))
        self.prop_path = "ell"
        if pretrained_item_emb is not None:
            # dim check mirrors lightgcn.py:21-22
            if pretrained_item_emb.shape[1] != self.embedding_dim:
                raise ValueError(
                    f"Pretrained embedding dim ({pretrained_item_emb.shape[1]}) "
                    f"does not match model embedding dim ({self.embedding_dim})."
                )
            self.pretrained_item_emb = np.asarray(
                pretrained_item_emb, dtype=np.float32
            )
        else:
            self.pretrained_item_emb = None

    # --- padded tensor-parallel layout ---
    def set_row_multiple(self, m: int) -> None:
        """Pad every embedding table's row count to a multiple of ``m``.

        Row-sharding over the model mesh axis (parallel/spmd.py) needs
        evenly divisible tables, and real vocab sizes almost never divide
        the mesh — the reference's exact-size ``nn.Embedding`` tables
        (main.py:467-469) silently fell back to full replication in
        round 1.  Pad rows are zero at init, receive zero gradient (the
        loss only gathers logical rows) and stay zero under Adam; the
        graph is remapped into the padded node space by
        graph.build.pad_graph_nodes.  Call before building trainers /
        initializing params.
        """
        m = max(1, int(m))
        self.row_multiple = m
        up = lambda n: -(-n // m) * m  # noqa: E731
        self.num_users_pad = up(self.num_users)
        self.num_items_pad = up(self.num_items)
        self.num_brands_pad = up(self.num_brands)
        # drop the cached jitted apply — offsets changed
        if hasattr(self, "_apply_jit"):
            del self._apply_jit

    def needs_row_padding(self, m: int) -> bool:
        return any(
            n % m for n in (self.num_users, self.num_items, self.num_brands)
        )

    def _table_pad_spec(self) -> dict:
        """params key -> (logical rows, padded rows) for the row-padded
        tables (shared by pad/unpad_state_tree; Fusion extends it)."""
        return {
            "user_embedding": (self.num_users, self.num_users_pad),
            "item_embedding": (self.num_items, self.num_items_pad),
            "brand_embedding": (self.num_brands, self.num_brands_pad),
        }

    def _map_tables(self, tree, fn):
        """Apply ``fn(x, logical, padded)`` to every leaf whose dict key
        names a row-padded table — params and optimizer state share the
        same key structure (optax.adam's mu/nu mirror the params dict)."""
        spec = self._table_pad_spec()

        def f(path, x):
            name = getattr(path[-1], "key", None) if path else None
            if name in spec and getattr(x, "ndim", 0) >= 1:
                return fn(x, *spec[name])
            return x

        return jax.tree_util.tree_map_with_path(f, tree)

    def unpad_state_tree(self, tree):
        """Slice padded table rows back to logical sizes (checkpoints
        store logical shapes, so they are portable across mesh sizes)."""

        def f(x, logical, padded):
            return x[:logical] if x.shape[0] == padded != logical else x

        return self._map_tables(tree, f)

    def pad_state_tree(self, tree):
        """Zero-pad logical table rows to the padded sizes (restoring a
        logical-shape checkpoint into a padded/sharded trainer)."""

        def f(x, logical, padded):
            if x.shape[0] == logical != padded:
                pad = jnp.zeros((padded - logical,) + x.shape[1:], x.dtype)
                return jnp.concatenate([jnp.asarray(x), pad])
            return x

        return self._map_tables(tree, f)

    @staticmethod
    def _pad_rows(x, target):
        n = x.shape[0]
        if target == n:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((target - n,) + x.shape[1:], x.dtype)]
        )

    # --- params ---
    def init(self, key: jax.Array) -> dict:
        ku, ki, kb = jax.random.split(key, 3)
        d = self.embedding_dim
        if self.pretrained_item_emb is not None:
            item = jnp.asarray(self.pretrained_item_emb, dtype=self.param_dtype)
        else:
            item = xavier_uniform(ki, (self.num_items, d), self.param_dtype)
        # logical rows are RNG-identical to the unpadded layout; pad rows
        # are zero and stay zero (no gradient ever reaches them)
        return {
            "user_embedding": self._pad_rows(
                xavier_uniform(ku, (self.num_users, d), self.param_dtype),
                self.num_users_pad,
            ),
            "item_embedding": self._pad_rows(item, self.num_items_pad),
            "brand_embedding": self._pad_rows(
                xavier_uniform(kb, (self.num_brands, d), self.param_dtype),
                self.num_brands_pad,
            ),
        }

    # --- forward ---
    def _initial_tables(self, params):
        """Layer-0 (user, item, brand) tables, padded rows as stored.
        The Fusion variant overrides this to return the fused item block;
        every forward path (dense block, halo tables) builds on it."""
        return (
            params["user_embedding"],
            params["item_embedding"],
            params["brand_embedding"],
        )

    def _initial_block(self, params):
        """Layer-0 node block [users | items | brands]."""
        return jnp.concatenate(self._initial_tables(params), axis=0)

    def apply(self, params: dict, graph: DeviceGraph):
        """Forward pass.

        Returns (final_user_emb, final_item_emb, final_brand_emb,
        user_emb_0, item_emb_0), mirroring lightgcn.py:81.  All five are
        *logical*-size slices even when the tables are row-padded for
        tensor parallelism (the graph must then be the padded-node-space
        remap from graph.build.pad_graph_nodes).
        """
        num_nodes = self.num_users_pad + self.num_items_pad + self.num_brands_pad
        ego = self._initial_block(params)
        # merge-skip fused path: one kernel computes sum_k A^k ego with a
        # single restore gather for all K layers (ops/spmm.py
        # propagate_sum_ell) — available when the device graph carries the
        # permuted-space views and layers >= 2
        fused = (
            self.prop_path == "ell"
            and self.n_layers >= 2
            and isinstance(graph, DeviceGraph)
            and len(graph.bucket_nbr_idx_perm) == len(graph.bucket_nbr_idx)
            and graph.dense_mat_perm is not None
        )
        if fused:
            from gcn_recommendation_tpu.ops.spmm import propagate_sum_ell

            x = ego.astype(self.compute_dtype)
            s = propagate_sum_ell(
                self.n_layers, x, graph.bucket_nbr_idx, graph.bucket_nbr_w,
                graph.bucket_nbr_idx_perm, graph.gather_idx, graph.dense_mat,
                graph.dense_mat_perm,
            )
            final = (
                (ego.astype(jnp.float32) + s) / (self.n_layers + 1)
            ).astype(ego.dtype)
            return self._split_final(final, params)
        # bf16 storage mode: propagate in compute_dtype, accumulate the
        # layer mean in f32 (exact no-op when compute_dtype == f32)
        acc = ego.astype(jnp.float32)
        x = ego.astype(self.compute_dtype)
        for _ in range(self.n_layers):
            x = propagate(x, graph, num_nodes, path=self.prop_path)
            acc = acc + x.astype(jnp.float32)
        final = (acc / (self.n_layers + 1)).astype(ego.dtype)
        return self._split_final(final, params)

    def _split_final(self, final, params):
        """Slice the propagated node block back into logical-size
        (final_user, final_item, final_brand, user0, item0)."""
        up, ip = self.num_users_pad, self.num_items_pad
        fu = final[: self.num_users]
        fi = final[up : up + self.num_items]
        fb = final[up + ip : up + ip + self.num_brands]
        return (
            fu,
            fi,
            fb,
            params["user_embedding"][: self.num_users],
            params["item_embedding"][: self.num_items],
        )

    def apply_with_propagator(self, params: dict, propagator, num_nodes_pad: int):
        """Forward pass through an external propagator (the halo-exchange
        sharded path, parallel/halo.py) that computes the whole
        mean-over-layers in one call.  Same returns as ``apply``."""
        num_nodes = self.num_users_pad + self.num_items_pad + self.num_brands_pad
        ego = self._initial_block(params)
        if num_nodes_pad > num_nodes:
            ego = jnp.concatenate(
                [ego, jnp.zeros((num_nodes_pad - num_nodes, ego.shape[1]), ego.dtype)]
            )
        final = propagator(ego)[:num_nodes]
        return self._split_final(final, params)

    def apply_with_table_propagator(self, params: dict, propagator):
        """Forward pass through a propagator taking the three layer-0
        tables separately (the table-sharded halo path, parallel/halo.py:
        row-sharded params enter the shard_map per table, so the layer-0
        halo exchange is three per-table all-gathers and no
        table-layout-to-node-layout relayout collective is ever needed).
        Tables are padded to their TP row pads if the caller passed
        logical-shape params (e.g. a restored logical checkpoint).
        Same returns as ``apply``."""
        u, i, b = self._initial_tables(params)
        u = self._pad_rows(u, self.num_users_pad)
        i = self._pad_rows(i, self.num_items_pad)
        b = self._pad_rows(b, self.num_brands_pad)
        final = propagator(u, i, b)
        return self._split_final(final, params)


def debug_diagnostics(model, params, graph_np, max_nodes: int = 20000, n_probe: int = 100, seed: int = 42):
    """Reference debug-mode self-checks, host-side.

    Reproduces the two diagnostics the reference runs inside forward()
    when ``--debug`` is set:

    * per-layer brand-embedding L2 norms (models/lightgcn.py:49-51);
    * the brand-influence check: average cosine similarity between the
      final item embeddings and a one-hop user-item-only propagation via
      the *dense* adjacency on ``n_probe`` random items
      (models/lightgcn.py:62-78).

    Runs in numpy on the host (the dense adjacency is debug-only and
    quadratic); refuses graphs above ``max_nodes``.  Returns a dict of
    the computed diagnostics and prints them like the reference.
    """
    g = graph_np
    n = g.num_nodes
    nu, ni = model.num_users, model.num_items
    if n > max_nodes:
        print(f"[debug] graph too large for dense diagnostics ({n} nodes)")
        return {}
    dense = np.zeros((n, n), np.float32)
    # true edges only — the COO arrays are padded past g.nnz with
    # (dst=n-1, src=0, w=0) sentinels, and numpy fancy-index += is
    # last-write-wins on duplicates, so including them could zero a real
    # edge at that position; np.add.at accumulates correctly regardless
    np.add.at(dense, (g.dst[: g.nnz], g.src[: g.nnz]), g.weight[: g.nnz])

    # slice off any tensor-parallel pad rows — the diagnostics run against
    # the *unpadded* bundle graph
    user0 = np.asarray(params["user_embedding"], np.float32)[: model.num_users]
    item0 = np.asarray(params["item_embedding"], np.float32)[: model.num_items]
    brand0 = np.asarray(params["brand_embedding"], np.float32)[: model.num_brands]
    ego = np.concatenate([user0, item0, brand0])

    norms = []
    acc = ego.copy()
    e = ego
    for layer in range(model.n_layers):
        e = dense @ e
        acc += e
        bn = float(np.linalg.norm(e[nu + ni :]))
        norms.append(bn)
        print(f"Layer {layer + 1} brand embedding L2 norm: {bn:.6f}")
    final = acc / (model.n_layers + 1)
    final_item = final[nu : nu + ni]

    rng = np.random.default_rng(seed)
    probe = rng.integers(0, ni, n_probe)
    item_with_brand = final_item[probe]

    adj_ui = dense[: nu + ni, : nu + ni]
    ego_nb = np.concatenate([user0, item0])
    ego_nb = adj_ui @ ego_nb
    item_nb = item0[probe] + ego_nb[nu : nu + ni][probe]

    dot = np.sum(item_with_brand * item_nb, axis=1)
    denom = np.linalg.norm(item_with_brand, axis=1) * np.linalg.norm(item_nb, axis=1)
    cos = float(np.mean(dot / np.maximum(denom, 1e-12)))
    print(f"Average cos similarity (item emb with/without brand): {cos:.6f}")
    return {"brand_norms": norms, "brand_influence_cosine": cos}
