"""LightGCN_Fusion — content-embedding fusion variant.

Behavioral parity with reference models/lightgcn_fusion.py:

* requires pretrained content embeddings — raises otherwise (:14-15);
* learnable ID embeddings for users/items/brands; the *frozen* content
  matrix is fused with the item ID embedding before propagation via
  ``LeakyReLU(Linear(concat(id_emb, content_emb)))`` (:45-49);
* same propagate / layer-mean / split as LightGCN (:52-62);
* returns the *ID* item embedding as layer-0 for the L2 regularizer (:65).

TPU-first notes: the content matrix is a non-trainable closure constant
(the reference keeps it as a registered buffer, :25) so the trainable
param pytree stays minimal for the optimizer and for sharding; the fusion
projection is a single dense matmul that XLA fuses with the activation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.models.lightgcn import LightGCN, xavier_uniform


class LightGCN_Fusion(LightGCN):
    name = "LightGCN_Fusion"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        num_brands: int,
        config,
        pretrained_item_emb: Optional[np.ndarray] = None,
    ):
        if pretrained_item_emb is None:
            # mirrors lightgcn_fusion.py:14-15
            raise ValueError("LightGCN_Fusion model requires pretrained item embeddings.")
        # Do NOT let the base class treat the content matrix as an item-table
        # init — Fusion keeps a random ID table (lightgcn_fusion.py:21).
        super().__init__(num_users, num_items, num_brands, config, None)
        self.content_dim = int(pretrained_item_emb.shape[1])
        # `fusemb` grid variant: ID table initialized from the pretrained
        # matrix, trainable (the commented-out from_pretrained alternative
        # at reference lightgcn_fusion.py:21)
        self.fusion_id_init = bool(getattr(config, "fusion_id_init", False))
        if self.fusion_id_init and self.content_dim != self.embedding_dim:
            raise ValueError(
                f"fusion_id_init needs pretrained dim ({self.content_dim}) "
                f"== embedding dim ({self.embedding_dim})"
            )
        # kept on host; becomes a FROZEN params entry at init() so it flows
        # through jit as an argument, never a closure constant (PERF.md) —
        # like the reference's registered buffer it also lands in
        # checkpoints (lightgcn_fusion.py:25)
        self._content_np = np.asarray(pretrained_item_emb, dtype=np.float32)

    def _table_pad_spec(self) -> dict:
        # the frozen content matrix rides the item-table padding too (it
        # is row-aligned with the item ID table in _initial_block)
        spec = super()._table_pad_spec()
        spec["item_content_embedding"] = (self.num_items, self.num_items_pad)
        return spec

    def init(self, key: jax.Array) -> dict:
        ku, ki, kb, kw = jax.random.split(key, 4)
        d = self.embedding_dim
        fan_in = d + self.content_dim
        # torch Linear keeps weight as [out, in]; xavier bound is symmetric
        # in (fan_in, fan_out) so the transpose convention is equivalent.
        return {
            "user_embedding": self._pad_rows(
                xavier_uniform(ku, (self.num_users, d), self.param_dtype),
                self.num_users_pad,
            ),
            "item_embedding": self._pad_rows(
                jnp.asarray(self._content_np, dtype=self.param_dtype)
                if self.fusion_id_init
                else xavier_uniform(ki, (self.num_items, d), self.param_dtype),
                self.num_items_pad,
            ),
            "brand_embedding": self._pad_rows(
                xavier_uniform(kb, (self.num_brands, d), self.param_dtype),
                self.num_brands_pad,
            ),
            "fusion_kernel": xavier_uniform(kw, (fan_in, d), self.param_dtype),
            # torch.nn.Linear default bias init is U(-1/sqrt(fan_in), +);
            # the reference leaves the bias at that default (:29,35).
            "fusion_bias": jax.random.uniform(
                jax.random.fold_in(kw, 1),
                (d,),
                self.param_dtype,
                minval=-1.0 / np.sqrt(fan_in),
                maxval=1.0 / np.sqrt(fan_in),
            ),
            # frozen content matrix: gradients stopped in _initial_block, so
            # Adam's update is exactly zero and the values never change
            "item_content_embedding": self._pad_rows(
                jnp.asarray(self._content_np), self.num_items_pad
            ),
        }

    def _initial_tables(self, params):
        # Fuse ID + frozen content embeddings before propagation
        # (lightgcn_fusion.py:45-49).  Row-wise, so under row-sharded
        # params each shard fuses only its own item rows.
        combined = jnp.concatenate(
            [
                params["item_embedding"],
                jax.lax.stop_gradient(params["item_content_embedding"]).astype(
                    params["item_embedding"].dtype
                ),
            ],
            axis=1,
        )
        fused = (
            jnp.dot(
                combined,
                params["fusion_kernel"],
                preferred_element_type=jnp.float32,
                # full f32 on the MXU: this matmul sets the item features for
                # the whole propagation, and it is tiny — precision over speed
                precision=jax.lax.Precision.HIGHEST,
            ).astype(params["item_embedding"].dtype)
            + params["fusion_bias"]
        )
        fused = jax.nn.leaky_relu(fused)  # default slope 0.01, as F.leaky_relu
        return params["user_embedding"], fused, params["brand_embedding"]
