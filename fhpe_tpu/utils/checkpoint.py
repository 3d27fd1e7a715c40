"""Checkpoint save / load / auto-resume.

Same semantics as the reference (``lib/utils/utils.py:78-83,204-258``,
``tools/train.py:192-202,230-245``): a rolling ``checkpoint`` with
{epoch, perf, state}, a ``model_best`` snapshot on improvement, and a
``final_state`` at the end; AUTO_RESUME restores epoch/best-perf/model/
optimizer.  Serialization is flax msgpack over numpy-converted pytrees
(no torch pickle).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"
FINAL_NAME = "final_state.msgpack"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_dir: str, state, epoch: int, perf: float,
                    is_best: bool, filename: str = CKPT_NAME) -> None:
    """Write rolling checkpoint; snapshot params on best perf."""
    os.makedirs(output_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "perf": float(perf),
        "state": serialization.to_state_dict(_to_numpy(state)),
    }
    with open(os.path.join(output_dir, filename), "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(os.path.join(output_dir, "checkpoint_meta.json"), "w") as f:
        json.dump({"epoch": epoch, "perf": float(perf)}, f)
    if is_best:
        best = {
            "params": serialization.to_state_dict(_to_numpy(state.params)),
            "batch_stats": serialization.to_state_dict(
                _to_numpy(state.batch_stats)),
        }
        with open(os.path.join(output_dir, BEST_NAME), "wb") as f:
            f.write(serialization.msgpack_serialize(best))


def save_final_state(output_dir: str, state) -> None:
    best = {
        "params": serialization.to_state_dict(_to_numpy(state.params)),
        "batch_stats": serialization.to_state_dict(_to_numpy(state.batch_stats)),
    }
    with open(os.path.join(output_dir, FINAL_NAME), "wb") as f:
        f.write(serialization.msgpack_serialize(best))


def load_checkpoint_file(path: str) -> Dict[str, Any]:
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
    path = os.path.join(output_dir, CKPT_NAME)
    if not os.path.exists(path):
        return state, None, None
    payload = load_checkpoint_file(path)
    state = restore_train_state(state, payload)
    return state, int(payload["epoch"]), float(payload["perf"])
