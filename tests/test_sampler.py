"""Negative-sampler tests: validity, distribution, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from gcn_recommendation_tpu.data.sampler import (
    epoch_batches,
    make_negative_sampler,
    membership_arrays,
)


def _toy_positives():
    # user 0: items {0,1,2}; user 1: {3}; user 2: {} (no positives)
    users = np.array([0, 0, 0, 1], np.int32)
    items = np.array([2, 0, 1, 3], np.int32)
    return membership_arrays(users, items, num_users=3)


def test_negatives_never_positive():
    # the toy catalog has 30% positive density — far above real data —
    # so give the rejection loop enough rounds to make leakage ~0.3^24
    user_ptr, flat = _toy_positives()
    sampler = make_negative_sampler(user_ptr, flat, num_items=10, n_rounds=24)
    users = jnp.asarray(np.repeat([0, 1, 2], 500).astype(np.int32))
    negs = np.asarray(sampler(jax.random.PRNGKey(0), users))
    pos_sets = {0: {0, 1, 2}, 1: {3}, 2: set()}
    for u, n in zip(np.asarray(users), negs):
        assert n not in pos_sets[int(u)]
        assert 0 <= n < 10


def test_negatives_uniform_over_non_positives():
    user_ptr, flat = _toy_positives()
    sampler = make_negative_sampler(user_ptr, flat, num_items=10, n_rounds=24)
    users = jnp.zeros(70000, jnp.int32)  # user 0 -> valid negatives {3..9}
    negs = np.asarray(sampler(jax.random.PRNGKey(1), users))
    counts = np.bincount(negs, minlength=10)
    assert counts[:3].sum() == 0
    expected = len(negs) / 7
    np.testing.assert_allclose(counts[3:], expected, rtol=0.05)


def test_sampler_deterministic_per_key():
    user_ptr, flat = _toy_positives()
    sampler = make_negative_sampler(user_ptr, flat, num_items=10)
    users = jnp.asarray(np.array([0, 1, 2, 0] * 8, np.int32))
    a = np.asarray(sampler(jax.random.PRNGKey(7), users))
    b = np.asarray(sampler(jax.random.PRNGKey(7), users))
    c = np.asarray(sampler(jax.random.PRNGKey(8), users))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_membership_arrays_sorted_per_user():
    user_ptr, flat = _toy_positives()
    assert list(flat[user_ptr[0] : user_ptr[1]]) == [0, 1, 2]
    assert list(flat[user_ptr[1] : user_ptr[2]]) == [3]
    assert user_ptr[2] == user_ptr[3]  # user 2 empty


def test_epoch_batches_cover_all_indices():
    idx = np.asarray(epoch_batches(jax.random.PRNGKey(0), 103, 16))
    assert idx.shape == (7, 16)  # ceil(103/16)
    seen = np.unique(idx)
    np.testing.assert_array_equal(seen, np.arange(103))


def test_epoch_batches_shuffles_between_keys():
    a = np.asarray(epoch_batches(jax.random.PRNGKey(0), 64, 8))
    b = np.asarray(epoch_batches(jax.random.PRNGKey(1), 64, 8))
    assert (a != b).any()


def test_epoch_batches_dataset_smaller_than_batch():
    # n < batch_size must tile the permutation, not crash
    idx = np.asarray(epoch_batches(jax.random.PRNGKey(0), 50, 128))
    assert idx.shape == (1, 128)
    np.testing.assert_array_equal(np.unique(idx), np.arange(50))
