"""Checkpoint save / load / auto-resume.

Same semantics as the reference (``lib/utils/utils.py:78-83,204-258``,
``tools/train.py:192-202,230-245``): a rolling ``checkpoint`` with
{epoch, perf, state}, a ``model_best`` snapshot on improvement, and a
``final_state`` at the end; AUTO_RESUME restores epoch/best-perf/model/
optimizer.  Serialization is flax msgpack over numpy-converted pytrees
(no torch pickle).

Production hardening beyond the reference: writes are ATOMIC (tmp +
``os.replace`` — a preemption mid-write can't corrupt the rolling
checkpoint AUTO_RESUME depends on) and ASYNC (the D2H snapshot happens on
the caller, serialization + file IO on a background thread, one write in
flight — the next epoch trains while the previous epoch's state hits
disk).  ``flush_pending`` joins outstanding writes; every read path calls
it first.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"
FINAL_NAME = "final_state.msgpack"


class _DirWriter:
    """Async write queue for ONE output directory.

    Writers are keyed per-directory so concurrent trainers in one process
    (tests, multi-run drivers) never serialize through a shared queue and
    ``flush_pending`` never joins another run's writes."""

    def __init__(self):
        self.pool = ThreadPoolExecutor(max_workers=1)
        self.pending = []

    def flush(self):
        while self.pending:
            self.pending.pop(0).result()


_writers: Dict[str, _DirWriter] = {}


def _writer_for(output_dir: str) -> _DirWriter:
    key = os.path.abspath(output_dir)
    if key not in _writers:
        _writers[key] = _DirWriter()
    return _writers[key]


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def flush_pending(output_dir: str | None = None) -> None:
    """Join in-flight checkpoint writes (re-raises their errors).

    With ``output_dir``, joins only that run's writes; without, all."""
    if output_dir is not None:
        key = os.path.abspath(output_dir)
        if key in _writers:
            _writers[key].flush()
        return
    for w in list(_writers.values()):
        w.flush()


def save_checkpoint(output_dir: str, state, epoch: int, perf: float,
                    is_best: bool, filename: str = CKPT_NAME,
                    async_write: bool = True) -> None:
    """Write rolling checkpoint; snapshot params on best perf."""
    os.makedirs(output_dir, exist_ok=True)
    # Snapshot to host on the caller (the unavoidable D2H); keep at most
    # one write in flight so memory holds one extra state copy.
    writer = _writer_for(output_dir)
    writer.flush()
    payload = {
        "epoch": epoch,
        "perf": float(perf),
        "state": serialization.to_state_dict(_to_numpy(state)),
    }
    best = None
    if is_best:
        best = {"params": payload["state"]["params"],
                "batch_stats": payload["state"].get("batch_stats", {})}

    def work():
        _write_atomic(os.path.join(output_dir, filename),
                      serialization.msgpack_serialize(payload))
        meta = json.dumps({"epoch": epoch, "perf": float(perf)})
        _write_atomic(os.path.join(output_dir, "checkpoint_meta.json"),
                      meta.encode("utf-8"))
        if best is not None:
            _write_atomic(os.path.join(output_dir, BEST_NAME),
                          serialization.msgpack_serialize(best))

    if async_write:
        writer.pending.append(writer.pool.submit(work))
    else:
        work()


def save_best(output_dir: str, state, async_write: bool = True) -> None:
    """Snapshot ONLY ``model_best`` (no rolling checkpoint).

    Needed when TRAIN.CKPT_FREQ skips the rolling checkpoint of an eval
    epoch that nevertheless set a new best: ``best_perf`` keeps ratcheting
    up in the epoch loop, so without this write the best weights would be
    lost and later, worse, epochs could never qualify — ``model_best``
    would go stale or never be written at all."""
    os.makedirs(output_dir, exist_ok=True)
    writer = _writer_for(output_dir)
    writer.flush()
    best = {
        "params": serialization.to_state_dict(_to_numpy(state.params)),
        "batch_stats": serialization.to_state_dict(
            _to_numpy(state.batch_stats)),
    }

    def work():
        _write_atomic(os.path.join(output_dir, BEST_NAME),
                      serialization.msgpack_serialize(best))

    if async_write:
        writer.pending.append(writer.pool.submit(work))
    else:
        work()


def release_writer(output_dir: str) -> None:
    """Flush and retire a run's async writer (end of run).  Without this
    every output dir leaks one parked writer thread for the process
    lifetime (tests, multi-run drivers)."""
    key = os.path.abspath(output_dir)
    w = _writers.pop(key, None)
    if w is not None:
        w.flush()
        w.pool.shutdown(wait=True)


def save_final_state(output_dir: str, state) -> None:
    flush_pending(output_dir)
    best = {
        "params": serialization.to_state_dict(_to_numpy(state.params)),
        "batch_stats": serialization.to_state_dict(_to_numpy(state.batch_stats)),
    }
    _write_atomic(os.path.join(output_dir, FINAL_NAME),
                  serialization.msgpack_serialize(best))
    release_writer(output_dir)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    flush_pending(os.path.dirname(path) or ".")
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_train_state(state, payload: Dict[str, Any]):
    """Restore a TrainState template from a checkpoint payload."""
    return serialization.from_state_dict(state, payload["state"])


def load_model_weights(path: str) -> Dict[str, Any]:
    """Load a best/final snapshot -> {"params", "batch_stats"} pytrees."""
    payload = load_checkpoint_file(path)
    if "state" in payload:  # full checkpoint: pull the model out of it
        return {"params": payload["state"]["params"],
                "batch_stats": payload["state"].get("batch_stats", {})}
    return {"params": payload["params"],
            "batch_stats": payload.get("batch_stats", {})}


def auto_resume(output_dir: str, state):
    """(state, begin_epoch, best_perf) — resume if a checkpoint exists."""
    flush_pending(output_dir)
    path = os.path.join(output_dir, CKPT_NAME)
    if not os.path.exists(path):
        return state, None, None
    payload = load_checkpoint_file(path)
    state = restore_train_state(state, payload)
    return state, int(payload["epoch"]), float(payload["perf"])


def auto_resume_multihost(output_dir: str, state):
    """Multi-host-safe AUTO_RESUME: process 0 decides, everyone follows.

    Checkpoints are written by process 0 only (``cli/train.py`` gates
    saves on the eval process), so per-process local reads would resume
    process 0 at epoch k and everyone else at epoch 0 — mismatched SPMD
    step counts and LR schedules that hang or silently diverge.  Instead
    process 0 reads its local checkpoint and the resume decision plus the
    full restored state are broadcast to all processes
    (``multihost_utils.broadcast_one_to_all`` over DCN); no shared
    filesystem is required.  Single-process: plain ``auto_resume``.
    """
    if jax.process_count() == 1:
        return auto_resume(output_dir, state)
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        restored, epoch, perf = auto_resume(output_dir, state)
        found = epoch is not None
    else:
        restored, epoch, perf, found = state, 0, 0.0, False
    meta = multihost_utils.broadcast_one_to_all(
        np.asarray([float(found), float(epoch or 0), float(perf or 0.0)]))
    if not bool(meta[0]):
        return state, None, None
    state = multihost_utils.broadcast_one_to_all(restored)
    return state, int(meta[1]), float(meta[2])
