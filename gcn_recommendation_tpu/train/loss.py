"""BPR loss + L2 regularization (+ optional brand/author preference loss).

Exact formula parity with reference ``bpr_loss_reg`` (main.py:366-402):

* BPR: ``-mean(log(sigmoid(pos - neg) + 1e-8))`` on final embeddings
  (main.py:377-379);
* optional brand BPR term, weight 0.1, scoring users against the final
  brand embeddings of the pos/neg items' brands (main.py:383-391);
* L2: ``lambda * (||u0||^2 + ||i0+||^2 + ||i0-||^2) / B`` on the *layer-0*
  embeddings of the batch rows (main.py:394-398).

Note the reference's ``--brand_loss`` flag is dead in practice (undefined
``item_to_brand`` at main.py:505-509 and the kwarg never forwarded at
main.py:618).  Here the wiring is fixed: the trainer passes a precomputed
item->brand index map, making the documented feature actually usable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-8  # main.py:379


def bpr_loss_reg(
    final_user_emb: jax.Array,      # [B, d]
    final_pos_item_emb: jax.Array,  # [B, d]
    final_neg_item_emb: jax.Array,  # [B, d]
    initial_user_emb: jax.Array,    # [B, d] layer-0 rows
    initial_pos_item_emb: jax.Array,
    initial_neg_item_emb: jax.Array,
    lambda_reg: float,
    brand_loss: bool = False,
    final_brand_emb: Optional[jax.Array] = None,   # [num_brands, d]
    pos_item_brand_idx: Optional[jax.Array] = None,  # [B]
    neg_item_brand_idx: Optional[jax.Array] = None,  # [B]
    brand_loss_weight: float = 0.1,
) -> jax.Array:
    pos_scores = jnp.sum(final_user_emb * final_pos_item_emb, axis=1)
    neg_scores = jnp.sum(final_user_emb * final_neg_item_emb, axis=1)
    bpr = -jnp.mean(jnp.log(jax.nn.sigmoid(pos_scores - neg_scores) + EPS))

    brand_loss_val = 0.0
    if brand_loss and final_brand_emb is not None:
        # items without brand metadata carry a -1 sentinel (data/loader.py):
        # mask those pairs out of the mean instead of training the user
        # toward an arbitrary brand embedding
        valid = (pos_item_brand_idx >= 0) & (neg_item_brand_idx >= 0)
        pos_brand_emb = jnp.take(
            final_brand_emb, jnp.maximum(pos_item_brand_idx, 0), axis=0
        )
        neg_brand_emb = jnp.take(
            final_brand_emb, jnp.maximum(neg_item_brand_idx, 0), axis=0
        )
        brand_pos = jnp.sum(final_user_emb * pos_brand_emb, axis=1)
        brand_neg = jnp.sum(final_user_emb * neg_brand_emb, axis=1)
        per_pair = -jnp.log(jax.nn.sigmoid(brand_pos - brand_neg) + EPS)
        denom = jnp.maximum(jnp.sum(valid), 1)
        brand_loss_val = jnp.sum(jnp.where(valid, per_pair, 0.0)) / denom

    batch = final_user_emb.shape[0]
    reg = (
        lambda_reg
        * (
            jnp.sum(jnp.square(initial_user_emb))
            + jnp.sum(jnp.square(initial_pos_item_emb))
            + jnp.sum(jnp.square(initial_neg_item_emb))
        )
        / float(batch)
    )
    return bpr + brand_loss_weight * brand_loss_val + reg
