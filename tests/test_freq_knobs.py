"""TRAIN.EVAL_FREQ / TRAIN.CKPT_FREQ / DATASET.SYNTH_OVERFIT knob
semantics (round-3 soak-driver knobs, docs/STATUS_R3.md).

EVAL_FREQ N validates every N-th epoch (plus the final epoch);
CKPT_FREQ M checkpoints every M-th eval; SYNTH_OVERFIT validates on the
EXACT training db (memorization-ceiling runs)."""

import json
import logging
import sys

import yaml


def _write_cfg(tmp_path, **over):
    cfg = {
        "OUTPUT_DIR": str(tmp_path / "out"),
        "LOG_DIR": str(tmp_path / "log"),
        "PRINT_FREQ": 50,
        "AUTO_RESUME": False,
        "DATASET": {"DATASET": "synthetic", "ROOT": str(tmp_path / "data"),
                    "TEST_SET": "valid", "TRAIN_SET": "train"},
        "MODEL": {"NAME": "hourglass", "NUM_JOINTS": 16,
                  "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                  "SIGMA": 2,
                  "EXTRA": {"NUM_FEATURES": 64, "NUM_STACKS": 1,
                            "NUM_BLOCKS": 1}},
        "TRAIN": {"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 4, "LR": 0.001,
                  "EVAL_FREQ": 2, "CKPT_FREQ": 2},
        "TEST": {"BATCH_SIZE_PER_GPU": 2, "FLIP_TEST": False},
        "TPU": {"COMPUTE_DTYPE": "float32"},
        "DEBUG": {"DEBUG": False},
    }
    cfg.update(over)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_eval_and_ckpt_freq(tmp_path, caplog):
    from fhpe_tpu.cli import train as train_cli

    cfg_path = _write_cfg(tmp_path)
    old = sys.argv
    sys.argv = ["train", "--cfg", cfg_path]
    try:
        # under pytest the root logger already has handlers, so the CLI's
        # basicConfig(filename=...) is a no-op; observe via caplog instead.
        with caplog.at_level(logging.INFO):
            train_cli.main()
    finally:
        sys.argv = old

    log_text = "\n".join(r.getMessage() for r in caplog.records)
    # END_EPOCH=4, EVAL_FREQ=2 -> validation after epochs 2 and 4 only.
    assert log_text.count("overall PCK") == 2
    # CKPT_FREQ=2 -> checkpoint every 4th epoch (2*2) or final: epoch 4 only.
    run_dir = next((tmp_path / "out" / "synthetic" / "hourglass").iterdir())
    meta = json.loads((run_dir / "checkpoint_meta.json").read_text())
    assert meta["epoch"] == 4
    assert log_text.count("saving checkpoint") == 1
    assert (run_dir / "final_state.msgpack").exists()


def test_model_best_written_on_ckpt_skipped_eval(tmp_path, caplog):
    """A best-setting eval whose rolling checkpoint CKPT_FREQ skips must
    still snapshot model_best (best_perf ratchets every eval, so the
    weights would otherwise be unrecoverable — and with a decaying perf
    curve model_best would never be written at all)."""
    from flax import serialization

    from fhpe_tpu.cli import train as train_cli
    from fhpe_tpu.utils import checkpoint as ck

    # EVAL_FREQ=1, CKPT_FREQ=4, END_EPOCH=2: eval after epoch 1 and 2;
    # rolling checkpoint only at the final epoch.  The epoch-1 eval is
    # best-at-the-time and must produce a model_best immediately.
    cfg_path = _write_cfg(
        tmp_path, TRAIN={"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 2,
                         "LR": 0.001, "EVAL_FREQ": 1, "CKPT_FREQ": 4})
    old = sys.argv
    sys.argv = ["train", "--cfg", cfg_path]
    try:
        with caplog.at_level(logging.INFO):
            train_cli.main()
    finally:
        sys.argv = old

    run_dir = next((tmp_path / "out" / "synthetic" / "hourglass").iterdir())
    assert (run_dir / "model_best.msgpack").exists()
    # loadable snapshot with the expected tree
    best = ck.load_model_weights(str(run_dir / "model_best.msgpack"))
    assert "params" in best and best["params"]


def test_save_best_and_release_writer(tmp_path):
    """save_best writes ONLY the model_best snapshot (no rolling
    checkpoint, no meta), atomically; release_writer retires the dir's
    async writer so sequential runs don't leak parked threads."""
    import os
    from types import SimpleNamespace

    import jax.numpy as jnp

    from fhpe_tpu.utils import checkpoint as ck

    # save_best reads .params / .batch_stats like the CLIs' TrainState
    state = SimpleNamespace(params={"w": jnp.full((3, 3), 2.0)},
                            batch_stats={"m": jnp.zeros((3,))})
    out = str(tmp_path / "run")
    ck.save_best(out, state)
    ck.flush_pending(out)
    assert sorted(os.listdir(out)) == [ck.BEST_NAME]
    best = ck.load_model_weights(os.path.join(out, ck.BEST_NAME))
    assert float(best["params"]["w"][0][0]) == 2.0

    key = os.path.abspath(out)
    assert key in ck._writers
    ck.release_writer(out)
    assert key not in ck._writers
    # a later save to the same dir transparently re-creates a writer
    ck.save_best(out, state)
    ck.flush_pending(out)
    ck.release_writer(out)


def test_train_checkpoint_missing_path_fails_loudly(tmp_path):
    import pytest

    from fhpe_tpu.cli import train as train_cli

    cfg_path = _write_cfg(tmp_path)
    old = sys.argv
    sys.argv = ["train", "--cfg", cfg_path,
                "TRAIN.CHECKPOINT", str(tmp_path / "nope.msgpack")]
    try:
        with pytest.raises(SystemExit, match="TRAIN.CHECKPOINT not found"):
            train_cli.main()
    finally:
        sys.argv = old


def test_synth_overfit_val_is_train_db(tmp_path):
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.data import build_db

    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.ROOT = str(tmp_path / "d")
    cfg.DATASET.SYNTH_SIZE = 8
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]

    train_db = build_db(cfg, cfg.DATASET.TRAIN_SET, is_train=True)
    cfg.DATASET.SYNTH_OVERFIT = True
    val_db = build_db(cfg, cfg.DATASET.TEST_SET, is_train=False)
    assert len(val_db) == len(train_db)
    for a, b in zip(train_db, val_db):
        assert a["image"] == b["image"]
        assert (a["joints_3d"] == b["joints_3d"]).all()

    # default (overfit off): held-out split, different size and files
    cfg.DATASET.SYNTH_OVERFIT = False
    plain_val = build_db(cfg, cfg.DATASET.TEST_SET, is_train=False)
    assert len(plain_val) == len(train_db) // 2
    assert plain_val[0]["image"] != train_db[0]["image"]
