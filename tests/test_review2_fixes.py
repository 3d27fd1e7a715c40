"""Second code-review sweep fixes (round 3).

Covers: guaranteed watchdog exit despite blocking callbacks, eval-step
memoization across validate() calls, DEVICE_WARP config validation,
BatchLoader thread-pool retirement, and the first end-to-end
``fpd_train.main()`` run (teacher trained by ``train.main()``, then
distilled — exercising the teacher one-time device_put path).
"""

import sys
import threading
import time

import yaml


def test_fhpe_platform_override_env():
    """FHPE_PLATFORM must override the site-forced jax_platforms at package
    import, so hermetic CPU CLI runs work even when the site config
    force-routes to an accelerator whose transport may be down."""
    import os
    import subprocess

    env = dict(os.environ, FHPE_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import fhpe_tpu, jax; print(jax.config.jax_platforms)"],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "cpu"


def test_watchdog_exits_despite_blocking_callback():
    """A stall callback that itself hangs (e.g. flush of a wedged write)
    must not prevent the force-exit — the exit is the watchdog's one job."""
    from fhpe_tpu.utils.watchdog import StallWatchdog

    exited = threading.Event()

    def blocking_cb():
        time.sleep(60)  # far beyond the callback budget

    wd = StallWatchdog(0.2, on_stall=[blocking_cb],
                       exit_fn=lambda code: exited.set(), poll_s=0.05,
                       callback_timeout_s=0.3)
    wd.beat()
    t0 = time.monotonic()
    assert exited.wait(10.0)
    assert time.monotonic() - t0 < 5.0  # exited on the budget, not the 60s
    wd.stop()


def test_eval_step_memoized():
    """Repeated _cached_eval_step calls with the same identities reuse ONE
    compiled closure (validate() per eval epoch must not re-trace)."""
    import jax
    import jax.numpy as jnp

    from fhpe_tpu.cli import common
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA = type(cfg.MODEL)(
        {"NUM_FEATURES": 64, "NUM_STACKS": 1, "NUM_BLOCKS": 1})
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TEST.FLIP_TEST = False
    model = get_pose_net(cfg, dtype=jnp.float32)
    mesh = get_mesh(len(jax.devices()))

    s1 = common._cached_eval_step(model, cfg, mesh, True, None, None, False)
    s2 = common._cached_eval_step(model, cfg, mesh, True, None, None, False)
    assert s1 is s2
    # a different debug flag is a different traced program
    s3 = common._cached_eval_step(model, cfg, mesh, True, None, None, True)
    assert s3 is not s1


def test_device_warp_requires_device_preprocess(tmp_path):
    import pytest

    from fhpe_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump({
        "MODEL": {"NAME": "hourglass"},
        "TPU": {"DEVICE_WARP": True, "DEVICE_PREPROCESS": False},
    }))
    with pytest.raises(ValueError, match="DEVICE_WARP"):
        load_config(str(p))


def test_loader_close_retires_pools(tmp_path):
    from fhpe_tpu.config import get_default_config
    from fhpe_tpu.data import dataset_meta, make_synthetic_db
    from fhpe_tpu.data.loader import BatchLoader, PoseDataSource

    db = make_synthetic_db(str(tmp_path), 8, 16, (64, 64))
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, db, is_train=False,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    loader = BatchLoader(src, batch_size=4, shuffle=False,
                         host_targets=True, num_threads=2)
    _ = next(iter(loader))
    loader.close()
    assert loader.pool._shutdown and loader.batch_pool._shutdown
    loader.close()  # idempotent


def _write_cfg(path, out_dir, log_dir, data_dir, stacks, feats, extra=None):
    cfg = {
        "OUTPUT_DIR": out_dir,
        "LOG_DIR": log_dir,
        "PRINT_FREQ": 2,
        "DATASET": {"DATASET": "synthetic", "ROOT": data_dir,
                    "TEST_SET": "valid", "TRAIN_SET": "train"},
        "MODEL": {"NAME": "hourglass", "NUM_JOINTS": 16,
                  "IMAGE_SIZE": [64, 64], "HEATMAP_SIZE": [16, 16],
                  "SIGMA": 2,
                  "EXTRA": {"NUM_FEATURES": feats, "NUM_STACKS": stacks,
                            "NUM_BLOCKS": 1}},
        "TRAIN": {"BATCH_SIZE_PER_GPU": 2, "END_EPOCH": 1, "LR": 0.001},
        "TEST": {"BATCH_SIZE_PER_GPU": 2, "FLIP_TEST": False},
        "TPU": {"COMPUTE_DTYPE": "float32"},
        "DEBUG": {"DEBUG": False},
    }
    cfg.update(extra or {})
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_fpd_cli_end_to_end(tmp_path):
    """fpd_train.main(): teacher from a train.main() run, KD.TRAIN_TYPE
    FPD, one epoch — covers teacher load + one-time device_put, the FPD
    step, pre-train dual validation, and checkpointing."""
    import os

    from fhpe_tpu.cli import fpd_train as fpd_cli
    from fhpe_tpu.cli import train as train_cli

    base = dict(out_dir=str(tmp_path / "out"), log_dir=str(tmp_path / "log"),
                data_dir=str(tmp_path / "data"))
    tcfg_path = _write_cfg(tmp_path / "teacher.yaml", stacks=1, feats=64,
                           **base)
    scfg_path = _write_cfg(tmp_path / "student.yaml", stacks=1, feats=32,
                           **base)

    old = sys.argv
    try:
        sys.argv = ["train", "--cfg", tcfg_path]
        train_cli.main()
        run = next((tmp_path / "out" / "synthetic" / "hourglass").iterdir())
        teacher_ckpt = str(run / "final_state.msgpack")
        assert os.path.exists(teacher_ckpt)

        sys.argv = ["fpd_train", "--cfg", scfg_path, "--tcfg", tcfg_path,
                    "KD.TRAIN_TYPE", "FPD", "KD.TEACHER", teacher_ckpt,
                    "KD.ALPHA", "0.5",
                    "OUTPUT_DIR", str(tmp_path / "out_fpd")]
        fpd_cli.main()
    finally:
        sys.argv = old

    fpd_run = next((tmp_path / "out_fpd" / "synthetic" / "hourglass")
                   .iterdir())
    assert (fpd_run / "final_state.msgpack").exists()
    assert (fpd_run / "teacher_config.yaml").exists()
