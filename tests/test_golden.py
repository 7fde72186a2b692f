"""Golden-run regression (SURVEY.md §4d).

A fixed-seed 2-epoch training run on a fixed synthetic graph must
reproduce the recorded loss trajectory and validation metrics.  The JAX
threefry PRNG is stable across versions, so this catches any silent
numeric change in graph build, sampling, propagation, loss, or Adam.

Golden values recorded on CPU (jax 0.9.0); re-recorded 2026-08-20 when
negative sampling moved from per-step to one epoch-level vectorized
pass (trainer.py) — a different (equally uniform) RNG stream, so the
trajectory legitimately shifted.
"""

import jax
import numpy as np

from gcn_recommendation_tpu.config import Config
from gcn_recommendation_tpu.data.synthetic import synthetic_bundle
from gcn_recommendation_tpu.models import get_model
from gcn_recommendation_tpu.train.trainer import Trainer

GOLDEN_FIRST_LOSSES = [0.692329, 0.692064, 0.69214, 0.69218, 0.691995, 0.692005]
GOLDEN_LAST_LOSS = 0.691691
GOLDEN_N_LOSSES = 26
GOLDEN_RECALL = 0.12666667
GOLDEN_NDCG = 0.043916


def test_golden_training_trajectory():
    bundle = synthetic_bundle(
        num_users=300, num_items=200, num_brands=20, mean_degree=12.0,
        core=4, seed=123,
    )
    cfg = Config(embedding_dim=16, n_layers=2, epochs=2, batch_size=256)
    model = get_model("LightGCN")(
        bundle.num_users, bundle.num_items, bundle.num_brands, cfg
    )
    tr = Trainer(cfg, model, bundle)
    params, opt = tr.init_state(jax.random.PRNGKey(42))
    losses = []
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        key, ek = jax.random.split(key)
        params, opt, l = tr._epoch_fn(params, opt, ek)
        losses.extend(np.asarray(l).tolist())

    assert len(losses) == GOLDEN_N_LOSSES
    np.testing.assert_allclose(losses[:6], GOLDEN_FIRST_LOSSES, rtol=1e-4)
    np.testing.assert_allclose(losses[-1], GOLDEN_LAST_LOSS, rtol=1e-4)

    recall, ndcg = tr.validate(params)
    np.testing.assert_allclose(recall, GOLDEN_RECALL, rtol=1e-6)
    np.testing.assert_allclose(ndcg, GOLDEN_NDCG, rtol=1e-4)
