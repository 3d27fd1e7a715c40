"""CLI integration smoke: full train main on the synthetic dataset,
resume semantics, and test main reproducing the saved perf."""

import os
import sys

import numpy as np
import pytest
import yaml


def _write_cfg(tmp_path, **over):
    cfg = {
        "OUTPUT_DIR": str(tmp_path / "out"),
        "LOG_DIR": str(tmp_path / "log"),
        "PRINT_FREQ": 2,
        "AUTO_RESUME": True,
        "DATASET": {"DATASET": "synthetic", "ROOT": str(tmp_path / "data"),
                    "TEST_SET": "valid", "TRAIN_SET": "train"},
        "MODEL": {"NAME": "hourglass", "NUM_JOINTS": 16,
                  "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                  "SIGMA": 2,
                  "EXTRA": {"NUM_FEATURES": 64, "NUM_STACKS": 1,
                            "NUM_BLOCKS": 1}},
        "TRAIN": {"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 1, "LR": 0.001},
        "TEST": {"BATCH_SIZE_PER_GPU": 2, "FLIP_TEST": True,
                 "POST_PROCESS": True, "SHIFT_HEATMAP": True},
        "TPU": {"COMPUTE_DTYPE": "float32"},
        "DEBUG": {"DEBUG": True, "SAVE_BATCH_IMAGES_GT": True,
                  "SAVE_HEATMAPS_PRED": True},
    }
    cfg.update(over)
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _run_main(module, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_train_then_test_cli(tmp_path):
    from fhpe_tpu.cli import test as test_cli
    from fhpe_tpu.cli import train as train_cli

    cfg_path = _write_cfg(tmp_path)
    _run_main(train_cli, ["train", "--cfg", cfg_path])

    out_root = tmp_path / "out" / "synthetic" / "hourglass"
    run_dir = next(out_root.iterdir())
    assert (run_dir / "checkpoint.msgpack").exists()
    assert (run_dir / "final_state.msgpack").exists()
    assert (run_dir / "config.yaml").exists()
    # debug images dumped: train-loop batches and validate batches
    # (reference function.py:95 and :289)
    assert any(f.name.startswith("train_") and f.name.endswith("_gt.jpg")
               for f in run_dir.iterdir())
    assert any(f.name.startswith("val_") and f.name.endswith("_gt.jpg")
               for f in run_dir.iterdir())
    assert any(f.name.startswith("val_") and f.name.endswith("_hm_pred.jpg")
               for f in run_dir.iterdir())

    _run_main(test_cli, ["test", "--cfg", cfg_path, "TEST.MODEL_FILE",
                         str(run_dir / "final_state.msgpack")])


def test_missing_model_file_errors(tmp_path):
    from fhpe_tpu.cli import test as test_cli

    cfg_path = _write_cfg(tmp_path)
    with pytest.raises(SystemExit):
        _run_main(test_cli, ["test", "--cfg", cfg_path, "TEST.MODEL_FILE",
                             "/does/not/exist.msgpack"])


def test_checkpoint_async_atomic(tmp_path):
    """Async save must be joinable, loadable, and leave no .tmp files."""
    import jax.numpy as jnp
    from fhpe_tpu.utils import checkpoint as ck

    state = {"params": {"w": jnp.ones((4, 4))},
             "batch_stats": {"m": jnp.zeros((4,))}}

    out = str(tmp_path / "ck")
    ck.save_checkpoint(out, state, epoch=3, perf=0.5, is_best=True)
    ck.flush_pending()
    payload = ck.load_checkpoint_file(os.path.join(out, ck.CKPT_NAME))
    assert payload["epoch"] == 3 and payload["perf"] == 0.5
    best = ck.load_model_weights(os.path.join(out, ck.BEST_NAME))
    assert np.allclose(best["params"]["w"], 1.0)
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
