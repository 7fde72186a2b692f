"""Orbax checkpointing with resume support.

The reference only saves model weights on best-val-recall
(``torch.save(model.state_dict())``, main.py:547-551) — no optimizer
state and no way to resume training.  Here a checkpoint carries the
full training state (params, Adam state, epoch, best metric, RNG key),
written with Orbax under ``<dir>/<tag>`` for tags ``best`` and ``last``.

Multi-process (pod) mode: when ``jax.process_count() > 1`` every
process passes its global jax.Arrays straight to Orbax, which writes
only the locally addressable shards and coordinates the commit — no
host gather (``jax.device_get`` of a non-addressable array raises on a
real multi-host mesh).  ``save``/``wait``/restore are then collective:
every process must call them at the same points (the trainer already
does — fit() runs the identical program on every host).  Staging-dir
promotion runs on process 0 only, fenced by a cross-process barrier.
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


def _multiprocess() -> bool:
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def is_multiprocess() -> bool:
    """Public probe for callers that must branch on pod mode (the trainer
    keeps padded/sharded templates for restore there — see save())."""
    return _multiprocess()


def _barrier(name: str) -> None:
    """Cross-process fence (no-op single-process): promotion renames on
    process 0 must be visible before any process reads the final path."""
    if _multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"gcnrec_ckpt_{name}")


def _committed(staging: str) -> bool:
    """True when the staging dir holds a fully committed Orbax write.

    Orbax renames its tmp dir onto the staging path at commit AND writes
    a commit marker (``_CHECKPOINT_METADATA``) during finalization;
    checking the marker guards filesystems where the rename is not
    atomic (NFS/object stores) — 'dir exists' alone could promote a
    partially-materialized write over a good checkpoint."""
    try:
        return bool(ocp.utils.is_checkpoint_finalized(staging))
    except Exception:  # e.g. path vanished between exists() and the check
        return False


def _promote_staged() -> None:
    """Swap committed staging dirs over their final paths.

    Only called after ``wait_until_finished``; commit is verified via the
    Orbax marker (see _committed).  In multi-process mode the rename runs
    on process 0 only and all processes fence on a barrier."""
    for final, staging in list(_staged.items()):
        if os.path.exists(staging) and _committed(staging):
            if jax.process_index() == 0:
                if os.path.exists(final):
                    shutil.rmtree(final)
                os.replace(staging, final)
        del _staged[final]
    _barrier("promote")


def _layout_sidecar(path: str) -> str:
    return path + ".layout.json"


def _write_layout(path: str) -> None:
    """Record the checkpoint's storage layout next to it.

    Pod-mode checkpoints store the padded/sharded state as-is while
    single-process ones store logical (unpadded) shapes, so a checkpoint
    written in one mode cannot restore in the other; the sidecar turns
    the resulting opaque Orbax shape error into a descriptive one."""
    import json

    if jax.process_index() != 0:
        return
    meta = {
        "layout": "sharded" if _multiprocess() else "logical",
        "process_count": int(jax.process_count()),
    }
    # the sidecar is written synchronously while the Orbax save is still
    # ASYNC — on the very first save of a run the checkpoint dir may not
    # exist yet (observed as a FileNotFoundError race in the round-3
    # regime-grid run), so create it here
    sidecar = _layout_sidecar(path)
    os.makedirs(os.path.dirname(sidecar) or ".", exist_ok=True)
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, sidecar)


def _check_layout(path: str) -> None:
    import json

    sidecar = _layout_sidecar(path)
    if not os.path.exists(sidecar):
        return  # pre-sidecar checkpoint; fall through to Orbax's own check
    try:
        with open(sidecar) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return
    current = "sharded" if _multiprocess() else "logical"
    if meta.get("layout") != current:
        raise RuntimeError(
            f"checkpoint at {path} was written in {meta.get('layout')!r} "
            f"layout (process_count={meta.get('process_count')}) but this "
            f"run is {current!r} (process_count={jax.process_count()}): "
            "pod-mode checkpoints store padded/sharded shapes while "
            "single-process ones store logical shapes — restore it with a "
            "run of the same mode (or convert via a single-process "
            "save/load roundtrip)."
        )


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
    if _multiprocess():
        # pod mode: hand Orbax the global jax.Arrays — each process
        # writes its addressable shards only (a host gather of the full
        # state would raise: other hosts' shards are non-addressable).
        # The sharded/padded layout is saved as-is; `transform` (logical
        # unpadding) is a host-side reshape and is skipped — restore
        # templates must come from the same trainer configuration.
        pass
    else:
        state = jax.device_get(state)  # synchronous snapshot to host numpy
        if transform is not None:
            # e.g. the model's unpad_state_tree: checkpoints store
            # *logical* table shapes so they restore into any mesh/pad
            # configuration
            state = transform(state)
    ckptr = _get_async_ckptr()
    ckptr.wait_until_finished()  # previous write is durable now
    _promote_staged()
    staging = path + _STAGING_SUFFIX
    # Stale-staging cleanup (leftover from a crashed run) must be
    # single-writer: in pod mode every process sees the same shared
    # filesystem, and concurrent rmtree calls race each other (ENOENT
    # mid-walk) — worse, a slow process could delete a staging dir a
    # fast process's Orbax write has just started repopulating.  So only
    # process 0 cleans, and everyone fences before the collective save.
    if jax.process_index() == 0 and os.path.exists(staging):
        shutil.rmtree(staging)  # stale leftover from a crashed run
    _barrier("staging_clean")
    ckptr.save(staging, state)
    _staged[path] = staging
    _write_layout(path)
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
    if os.path.exists(staging) and _committed(staging):
        # a previous process crashed after its write committed but before
        # the swap — the commit marker proves the staging dir is complete
        # and it is strictly newer than the final dir, so promote it now
        if jax.process_index() == 0:
            if os.path.exists(path):
                shutil.rmtree(path)
            os.replace(staging, path)
    _barrier("restore_promote")
    if not os.path.exists(path):
        return None
    _check_layout(path)
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
