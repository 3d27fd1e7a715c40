"""Evaluation CLI.

Equivalent of the reference ``tools/test.py``: load ``TEST.MODEL_FILE`` (or
``final_state`` from the latest run dir), run the full validation pass with
flip-test and dataset metrics.

Usage:
  python -m fhpe_tpu.cli.test --cfg <cfg.yaml> TEST.MODEL_FILE <weights>
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from flax import serialization

from ..models import get_pose_net, is_multi_output
from ..parallel.mesh import get_mesh
from ..utils.checkpoint import FINAL_NAME, load_model_weights
from ..utils.dtype import compute_dtype
from ..utils.logger import create_logger
from ..utils.summary import get_model_summary
from .common import (build_loaders, load_cfg_from_args, make_evaluate_fn,
                     multihost_eval_setup, parse_args, validate)


def main():
    args = parse_args("Test keypoints network")
    cfg = load_cfg_from_args(args)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "valid")

    n_dev = (cfg.TPU.NUM_DEVICES if cfg.TPU.NUM_DEVICES > 0
             else len(jax.devices()))
    mesh = get_mesh(n_dev)
    dtype = compute_dtype(cfg)
    model = get_pose_net(cfg, dtype=dtype)
    logger.info(get_model_summary(
        model, (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]))["text"])

    model_file = cfg.TEST.MODEL_FILE or os.path.join(output_dir, FINAL_NAME)
    if not os.path.exists(model_file):
        raise SystemExit(f"model file not found: {model_file}")
    logger.info(f"=> loading model from {model_file}")

    sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0], 3))
    init_vars = model.init(jax.random.PRNGKey(0), sample, train=False)
    weights = load_model_weights(model_file)
    variables = serialization.from_state_dict(init_vars, weights)
    # Commit the restored (numpy-leaf) weights to device once — numpy
    # arguments re-transfer on every jitted eval batch otherwise.
    if jax.process_count() == 1:
        from ..parallel.mesh import replicated
        variables = jax.device_put(variables, replicated(mesh))

    _, val_loader, meta = build_loaders(cfg, n_dev, train=False)
    evaluate_fn = make_evaluate_fn(cfg)
    eval_mesh, eval_vars, run_eval = multihost_eval_setup(mesh, variables)
    from ..utils.watchdog import StallWatchdog
    watchdog = StallWatchdog(float(cfg.TPU.get("STALL_TIMEOUT_S", 0)),
                             logger=logger)
    if run_eval:
        perf, name_values, *_ = validate(
            cfg, model, eval_vars, val_loader, eval_mesh, meta, logger,
            is_multi_output(model), evaluate_fn, output_dir,
            watchdog=watchdog)
        logger.info(f"=> final perf: {perf:.4f}")
    watchdog.stop()


if __name__ == "__main__":
    main()
