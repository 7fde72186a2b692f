"""Device-side BPR negative sampling and epoch batching.

The reference draws one uniform negative per interaction by host-Python
rejection sampling inside DataLoader workers (main.py:349-363: redraw
until the candidate is not in the user's train-positive set).  That
pattern is host-bound and unusable under jit, so the TPU-native design
moves sampling onto the device while preserving the distribution —
uniform over each user's non-positive items:

* train positives live on device as a CSR-ish pair
  (``user_ptr``[U+1], ``flat_items``[nnz]) with per-user item lists
  sorted ascending;
* membership tests are a vectorized branch-free binary search
  (``log2(max_degree)`` iterations on the VPU) — no padded
  [users x max_degree] table, so memory stays O(nnz);
* rejection runs as a fixed number of redraw rounds under
  ``lax.fori_loop``.  With per-user catalog density p (typically <1%%),
  the probability any sample still collides after the default 6 rounds
  is p^6 (~1e-12 at p=1%%); such samples keep their last draw — a
  measure-zero deviation from true rejection sampling, noted for parity.
  Each round costs a full binary-search membership pass, so fewer
  rounds directly cut per-step time.

Epoch batching mirrors shuffled DataLoader epochs (main.py:462-464): a
device-side permutation reshaped to [steps, batch]; the trailing partial
batch is completed by wrapping to the permutation head (the reference's
final short batch — a deviation within run-to-run variance).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def binary_search_iters(user_ptr: np.ndarray) -> int:
    """Iterations needed for the per-user lower-bound search: ceil(log2(max degree))+1."""
    if len(user_ptr) < 2:
        return 1
    max_deg = int(np.max(user_ptr[1:] - user_ptr[:-1]))
    return max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1)


def membership_arrays(
    user_idx: np.ndarray, item_idx: np.ndarray, num_users: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (user_ptr, flat_items): per-user sorted positive item lists."""
    order = np.lexsort((item_idx, user_idx))
    u_sorted = np.asarray(user_idx)[order]
    flat_items = np.asarray(item_idx)[order].astype(np.int32)
    counts = np.bincount(u_sorted, minlength=num_users)
    user_ptr = np.zeros(num_users + 1, dtype=np.int32)
    np.cumsum(counts, out=user_ptr[1:])
    return user_ptr, flat_items


def padded_filter_rows(
    f_ptr: np.ndarray,
    f_items: np.ndarray,
    users: np.ndarray,
    width: int,
    pad_value: int,
) -> np.ndarray:
    """``[len(users), width]`` padded per-user item lists from the CSR
    membership arrays; unused slots hold ``pad_value`` (conventionally
    ``num_items``, which the masking kernels drop as out-of-bounds).
    Shared by the evaluator batch builder and the serving retriever so
    the padding convention lives in exactly one place."""
    lens = (f_ptr[1:] - f_ptr[:-1])[users]
    filt = np.full((len(users), width), pad_value, dtype=np.int32)
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(len(users)), lens)
        offs = np.cumsum(lens) - lens
        cols = np.arange(total) - np.repeat(offs, lens)
        flat = np.repeat(f_ptr[users], lens) + cols
        filt[rows, cols] = f_items[flat]
    return filt


def _is_positive(flat_items, user_ptr, users, cands, n_iters: int):
    """Vectorized lower-bound binary search membership test.

    ``users`` broadcasts against ``cands`` (e.g. ``users[..., None]``
    with ``[B, R]`` candidates tests all R draws in one pass)."""
    lo = jnp.broadcast_to(user_ptr[users], cands.shape)
    hi = jnp.broadcast_to(user_ptr[users + 1], cands.shape)
    end = hi
    n = flat_items.shape[0]

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = flat_items[jnp.minimum(mid, n - 1)]
        go_right = v < cands
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    found_val = flat_items[jnp.minimum(lo, n - 1)]
    return (lo < end) & (found_val == cands)


@functools.partial(
    jax.jit, static_argnames=("num_items", "n_rounds", "n_iters")
)
def sample_negatives(
    key: jax.Array,
    users: jax.Array,
    user_ptr: jax.Array,
    flat_items: jax.Array,
    *,
    num_items: int,
    n_rounds: int = 6,
    n_iters: int = 24,
) -> jax.Array:
    """Draw one uniform non-positive item per user (pure function).

    Batched one-pass rejection: all ``n_rounds`` candidates are drawn up
    front ``[B, R]`` and ONE vectorized membership search runs over all
    of them; each user keeps the first non-colliding candidate (or the
    last draw if every round collided — the same p^R residual as the
    sequential loop, see the module docstring).  Distributionally
    identical to redraw-until-clean over R iid uniforms, but the
    sequential depth drops from R * n_iters dependent micro-ops to
    n_iters (measured ~2.4x faster on v5e, tools/exp_step_profile.py).

    ``user_ptr``/``flat_items`` are jit arguments, NOT closure constants —
    closures would embed the positive sets into the compiled HLO as
    literals (huge compile payloads; see trainer.py docstring).
    """
    if flat_items.shape[0] == 0:
        return jax.random.randint(key, users.shape, 0, num_items, dtype=jnp.int32)

    cands = jax.random.randint(
        key, users.shape + (n_rounds,), 0, num_items, dtype=jnp.int32
    )
    colliding = _is_positive(
        flat_items, user_ptr, users[..., None], cands, n_iters
    )  # [B, R]
    ok = ~colliding
    first = jnp.argmax(ok, axis=-1).astype(jnp.int32)  # first clean draw
    pick = jnp.where(jnp.any(ok, axis=-1), first, n_rounds - 1)
    return jnp.take_along_axis(cands, pick[..., None], axis=-1)[..., 0]


def make_negative_sampler(
    user_ptr: np.ndarray,
    flat_items: np.ndarray,
    num_items: int,
    n_rounds: int = 6,
):
    """Convenience wrapper binding the positive-set arrays.

    The arrays are still passed at call time (as device arrays), so jit
    treats them as parameters.
    """
    user_ptr_d = jnp.asarray(user_ptr)
    flat_items_d = jnp.asarray(flat_items)
    n_iters = binary_search_iters(user_ptr) if len(flat_items) else 1

    def sample(key: jax.Array, users: jax.Array) -> jax.Array:
        return sample_negatives(
            key,
            users,
            user_ptr_d,
            flat_items_d,
            num_items=num_items,
            n_rounds=n_rounds,
            n_iters=n_iters,
        )

    return sample


@functools.partial(jax.jit, static_argnames=("n", "batch_size"))
def epoch_batches(key: jax.Array, n: int, batch_size: int) -> jax.Array:
    """[steps, batch] index matrix covering a shuffled epoch.

    The last batch wraps to the permutation head so shapes stay static.
    """
    steps = max(1, -(-n // batch_size))
    perm = jax.random.permutation(key, n)
    total = steps * batch_size
    # tile-and-trim handles datasets smaller than one batch too
    reps = -(-total // n)
    idx = jnp.tile(perm, reps)[:total] if total != n else perm
    return idx.reshape(steps, batch_size)
