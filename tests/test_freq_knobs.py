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
