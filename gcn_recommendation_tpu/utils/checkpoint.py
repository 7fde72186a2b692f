"""Orbax checkpointing with resume support.

The reference only saves model weights on best-val-recall
(``torch.save(model.state_dict())``, main.py:547-551) — no optimizer
state and no way to resume training.  Here a checkpoint carries the
full training state (params, Adam state, epoch, best metric, RNG key),
written with Orbax under ``<dir>/<tag>`` for tags ``best`` and ``last``.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_dict(params, opt_state, epoch, best_recall, key):
    return {
        "params": params,
        "opt_state": opt_state,
        "meta": {
            "epoch": np.asarray(epoch, np.int64),
            "best_recall": np.asarray(best_recall, np.float64),
            # legacy uint32 key data (jax.random.PRNGKey) — stored raw
            "key": np.asarray(key),
        },
    }


_async_ckptr: Optional[ocp.AsyncCheckpointer] = None

# final path -> staging path of an async write in flight.  The previous
# checkpoint stays on disk untouched until the replacement is fully
# written; only then is it swapped in (see _promote_staged) — a crash at
# any point leaves either the old or the new checkpoint restorable.
_staged: dict = {}

_STAGING_SUFFIX = ".staging"


def _get_async_ckptr() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def _promote_staged() -> None:
    """Swap completed staging dirs over their final paths.

    Only called after ``wait_until_finished`` — Orbax itself writes to a
    tmp dir and renames to the staging path on commit, so a staging dir
    that *exists* is complete."""
    for final, staging in list(_staged.items()):
        if os.path.exists(staging):
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(staging, final)
        del _staged[final]


def save(
    ckpt_dir: str,
    tag: str,
    params,
    opt_state,
    epoch: int,
    best_recall: float,
    key,
    transform=None,
) -> str:
    """Asynchronous, crash-safe save: the device->host fetch happens HERE,
    on the caller's thread, and only the file write runs in the background.
    (Letting the Orbax background thread touch device arrays races the
    axon/TPU client with concurrent training dispatches — observed as a
    wedged training loop.)  The write lands in ``<tag>.staging`` and is
    renamed over ``<tag>`` once durable, so the previous checkpoint
    survives a crash mid-write.  Call :func:`wait` before relying on the
    files, e.g. at process exit."""
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    state = _state_dict(params, opt_state, epoch, best_recall, key)
    state = jax.device_get(state)  # synchronous snapshot to host numpy
    if transform is not None:
        # e.g. the model's unpad_state_tree: checkpoints store *logical*
        # table shapes so they restore into any mesh/pad configuration
        state = transform(state)
    ckptr = _get_async_ckptr()
    ckptr.wait_until_finished()  # previous write is durable now
    _promote_staged()
    staging = path + _STAGING_SUFFIX
    if os.path.exists(staging):
        shutil.rmtree(staging)  # stale leftover from a crashed run
    ckptr.save(staging, state)
    _staged[path] = staging
    return path


def wait() -> None:
    """Block until any in-flight checkpoint write has finished, and swap
    completed writes over their final paths."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    _promote_staged()


def _restore(path: str, params_template, opt_state_template) -> Optional[Tuple]:
    wait()  # a concurrent async write may still be materializing files
    staging = path + _STAGING_SUFFIX
    if os.path.exists(staging):
        # a previous process crashed after its write committed but before
        # the swap — the staging dir is complete (Orbax renames on commit)
        # and strictly newer than the final dir, so promote it now
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(staging, path)
    if not os.path.exists(path):
        return None
    dummy_key = jax.random.PRNGKey(0)
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct,
        _state_dict(params_template, opt_state_template, 0, 0.0, dummy_key),
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, abstract)
    import jax.numpy as jnp

    key = jnp.asarray(state["meta"]["key"])
    return (
        state["params"],
        state["opt_state"],
        int(state["meta"]["epoch"]),
        float(state["meta"]["best_recall"]),
        key,
    )


def load_latest(ckpt_dir: str, params_template, opt_state_template) -> Optional[Tuple]:
    return _restore(
        os.path.abspath(os.path.join(ckpt_dir, "last")),
        params_template,
        opt_state_template,
    )


def load_best(ckpt_dir: str, params_template, opt_state_template) -> Optional[Tuple]:
    return _restore(
        os.path.abspath(os.path.join(ckpt_dir, "best")),
        params_template,
        opt_state_template,
    )
