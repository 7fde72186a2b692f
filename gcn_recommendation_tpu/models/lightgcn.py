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
        self.embedding_dim = config.embedding_dim
        self.n_layers = config.n_layers
        self.param_dtype = jnp.dtype(getattr(config, "param_dtype", "float32"))
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

    # --- params ---
    def init(self, key: jax.Array) -> dict:
        ku, ki, kb = jax.random.split(key, 3)
        d = self.embedding_dim
        if self.pretrained_item_emb is not None:
            item = jnp.asarray(self.pretrained_item_emb, dtype=self.param_dtype)
        else:
            item = xavier_uniform(ki, (self.num_items, d), self.param_dtype)
        return {
            "user_embedding": xavier_uniform(ku, (self.num_users, d), self.param_dtype),
            "item_embedding": item,
            "brand_embedding": xavier_uniform(kb, (self.num_brands, d), self.param_dtype),
        }

    # --- forward ---
    def _initial_block(self, params):
        """Layer-0 node block [users | items | brands]."""
        return jnp.concatenate(
            [
                params["user_embedding"],
                params["item_embedding"],
                params["brand_embedding"],
            ],
            axis=0,
        )

    def apply(self, params: dict, graph: DeviceGraph):
        """Forward pass.

        Returns (final_user_emb, final_item_emb, final_brand_emb,
        user_emb_0, item_emb_0), mirroring lightgcn.py:81.
        """
        num_nodes = self.num_users + self.num_items + self.num_brands
        ego = self._initial_block(params)
        acc = ego
        for _ in range(self.n_layers):
            ego = propagate(ego, graph, num_nodes, path=self.prop_path)
            acc = acc + ego
        final = acc / jnp.asarray(self.n_layers + 1, dtype=acc.dtype)
        fu = final[: self.num_users]
        fi = final[self.num_users : self.num_users + self.num_items]
        fb = final[self.num_users + self.num_items :]
        return fu, fi, fb, params["user_embedding"], params["item_embedding"]
