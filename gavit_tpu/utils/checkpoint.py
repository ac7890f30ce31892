"""Orbax checkpointing with true full resume.

Saves what the reference saves (``trainer.py:188-214``): model + criterion
params, optimizer state, step/epoch, best validation AUC, metrics, and the
full config — per-epoch directories named
``checkpoint_epoch_{E}_auc_{AUC:.4f}`` plus a ``best_model`` copy.

Unlike the reference — whose ``--resume`` restores model weights only and
restarts at epoch 0 (``scripts/train.py:160-166``, ``trainer.py:220-221``) —
``restore`` here rebuilds the complete training state (params, optimizer
moments, schedule step, epoch, best-AUC/patience counters), so resume
continues exactly where training stopped. ``latest_checkpoint`` enables
preemption-aware auto-resume on TPU VMs.
"""

from __future__ import annotations

import json
import logging
import os
import re
import threading
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

_pending_saves: list[threading.Thread] = []
_pending_errors: list[BaseException] = []
_pending_lock = threading.Lock()

# module-level so repeated save_async calls hit the jit cache instead of
# retracing the full-state copy every epoch
_snapshot = jax.jit(lambda t: jax.tree.map(lambda x: x + 0, t))

_STATE_SUBDIR = "state"
_META_FILE = "meta.json"
_EPOCH_RE = re.compile(r"checkpoint_epoch_(\d+)_auc_([0-9.]+)$")


def checkpoint_name(epoch: int, auc: float) -> str:
    return f"checkpoint_epoch_{epoch}_auc_{auc:.4f}"


def save(path: str, state_tree: Any, meta: dict,
         process_data: bytes | None = None) -> None:
    """Save a pytree (params/opt_state/step) + JSON metadata under ``path``.

    Multi-process discipline: the orbax save is a collective every process
    joins, but ``meta.json`` is written by process 0 ONLY — every process
    racing the same ``open(.., 'w')`` is a torn-file risk on NFS/GCS even
    with identical content. Strictly per-process payloads (a grain
    iterator's position, which differs across data shards) go through
    ``process_data``: each process writes its own
    ``loader_state_p{i}.bin`` — no shared file, no race — and reads back
    its own with :func:`load_process_data`.
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, _STATE_SUBDIR)
    ckptr.save(state_path, state_tree, force=True)
    ckptr.wait_until_finished()
    if process_data is not None:
        with open(_process_data_path(path), "wb") as f:
            f.write(process_data)
    if jax.process_index() == 0:
        with open(os.path.join(path, _META_FILE), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    logger.info(f"Saved checkpoint to {path}")


def _process_data_path(path: str, process_index: int | None = None) -> str:
    i = jax.process_index() if process_index is None else process_index
    return os.path.join(path, f"loader_state_p{i}.bin")


def load_process_data(path: str) -> bytes | None:
    """This process's ``process_data`` payload from ``save``, or None."""
    p = _process_data_path(os.path.abspath(path))
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return f.read()


def save_async(path: str, state_tree: Any, meta: dict,
               also: list[str] | None = None) -> None:
    """Schedule :func:`save` on a background thread and return immediately
    (the reference blocks its epoch loop on every torch.save; SURVEY §5 asks
    for async checkpointing).

    The training step donates its state buffers, so the tree is first
    snapshotted with an on-device copy (cheap HBM-to-HBM, non-aliased jit
    output; breaks aliasing with the live TrainState) — the persist then
    races nothing (device execution is stream-ordered: the copy is enqueued
    before any later donated step can reuse the buffers, and the background
    thread's host fetch blocks until the copy's values exist — no host-side
    barrier needed, which matters because ``jax.block_until_ready`` does not
    block through tunneled TPU backends). ``also`` writes extra copies
    (best_model) from the same snapshot in the same thread. Saves are
    SERIALIZED: each background thread first joins the previous one, so two
    epochs' best_model writes can neither interleave nor land out of order.
    Multi-process: orbax saves are collectives, and every process runs the
    same epoch loop, so the background calls stay symmetric. Call
    :func:`wait_for_saves` before process exit / preemption handoff /
    restore so no checkpoint is lost or read half-written — it RE-RAISES any
    background save failure, so the durability guarantee is real rather than
    log-only.
    """
    snapshot = _snapshot(state_tree)

    with _pending_lock:
        prev = [t for t in _pending_saves if t.is_alive()]
        _pending_saves[:] = prev

        def run():
            for p in prev:
                p.join()
            try:
                save(path, snapshot, meta)
                for extra in also or ():
                    save(extra, snapshot, meta)
            except BaseException as e:  # noqa: BLE001 - re-raised at the
                # next wait_for_saves barrier (log too, in case the process
                # dies before reaching one)
                logger.exception(f"async checkpoint save to {path} failed")
                with _pending_lock:
                    _pending_errors.append(e)

        t = threading.Thread(target=run, name="gavit-ckpt-save", daemon=True)
        _pending_saves.append(t)
    t.start()


def wait_for_saves() -> None:
    """Block until every scheduled :func:`save_async` has hit disk; raise
    the first background failure (durability barrier, not a formality)."""
    with _pending_lock:
        pending, _pending_saves[:] = _pending_saves[:], []
    for t in pending:
        t.join()
    with _pending_lock:
        errors, _pending_errors[:] = _pending_errors[:], []
    if errors:
        detail = "; ".join(f"{type(e).__name__}: {e}" for e in errors)
        raise RuntimeError(
            f"{len(errors)} async checkpoint save(s) failed: {detail}"
        ) from errors[0]


def restore(path: str, target_tree: Any) -> tuple[Any, dict]:
    """Restore (state pytree shaped like ``target_tree``, metadata dict)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target_tree)
    state = ckptr.restore(os.path.join(path, _STATE_SUBDIR), abstract)
    meta_path = os.path.join(path, _META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    logger.info(f"Restored checkpoint from {path}")
    return state, meta


def restore_unstructured(path: str) -> tuple[Any, dict]:
    """Restore a checkpoint without a target tree (structure inferred from
    disk) — used by evaluation, which doesn't know the optimizer shape."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, _STATE_SUBDIR))
    meta_path = os.path.join(path, _META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(save_dir: str) -> str | None:
    """Most recent per-epoch checkpoint directory, or None."""
    if not os.path.isdir(save_dir):
        return None
    best_epoch, best_path = -1, None
    for name in os.listdir(save_dir):
        m = _EPOCH_RE.match(name)
        if m and int(m.group(1)) > best_epoch:
            full = os.path.join(save_dir, name)
            if os.path.isdir(os.path.join(full, _STATE_SUBDIR)):
                best_epoch, best_path = int(m.group(1)), full
    return best_path
