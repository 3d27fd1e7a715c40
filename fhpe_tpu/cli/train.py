"""Normal training CLI.

Equivalent of the reference ``tools/train.py``: config merge, run-dir
logger, model summary, datasets/loaders, optimizer + epoch-boundary LR
schedule, AUTO_RESUME, epoch loop train -> validate -> checkpoint, final
state dump.  TPU-native internals: jitted SPMD train step over the data
mesh, fused on-device preprocessing, on-device PCK.

Usage:
  python -m fhpe_tpu.cli.train --cfg experiments/mpii/hourglass/hg4.yaml \
      [TRAIN.END_EPOCH 140 ...]
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..models import get_pose_net, is_multi_output
from ..parallel.mesh import get_mesh
from ..train.state import create_train_state, lr_for_epoch, set_lr
from ..train.step import make_batch_preprocessor, make_train_step
from ..utils.checkpoint import (auto_resume_multihost, save_checkpoint,
                                save_final_state)
from ..utils.dtype import compute_dtype
from ..utils.logger import WindowedMeters, create_logger, save_config_yaml
from ..utils.summary import get_model_summary
from ..utils.vis import save_debug_images
from .common import (build_loaders, is_main_process, load_cfg_from_args,
                     make_evaluate_fn, multihost_eval_setup, parse_args,
                     validate)


def train_one_epoch(cfg, loader, step_fn, state, mesh, epoch, logger,
                    writer=None, global_step=0, output_dir="",
                    watchdog=None):
    """One training epoch.  Set FHPE_PROFILE_DIR to capture a jax.profiler
    trace of steps 2-12 of epoch 0 (the reference offers wall-clock meters
    only; SURVEY.md section 5)."""
    from ..parallel.mesh import prefetch_to_device
    from .common import train_batch_keys

    profile_dir = os.environ.get("FHPE_PROFILE_DIR")
    trace_open = False
    meters = WindowedMeters(value_keys=("loss",))
    stream = prefetch_to_device(iter(loader), mesh, keys=train_batch_keys(cfg))
    for i, (dev, batch) in enumerate(stream):
        if profile_dir and epoch == 0 and i == 2:
            jax.profiler.start_trace(profile_dir)
            trace_open = True
        state, metrics = step_fn(state, dev)
        if trace_open and i == 12:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            trace_open = False
            logger.info(f"=> wrote profiler trace to {profile_dir}")
        n = batch["joints"].shape[0]
        meters.push(metrics, n)
        if i % cfg.PRINT_FREQ == 0:
            meters.drain()
            losses, accs = meters["loss"], meters["acc"]
            logger.info(
                f"Epoch: [{epoch}][{i}/{len(loader)}]  "
                f"Time {meters.batch_time.val:.3f}s  "
                f"Speed {meters.speed:.1f} samples/s  "
                f"Loss {losses.val:.5f} ({losses.avg:.5f})  "
                f"Accuracy {accs.val:.3f} ({accs.avg:.3f})")
            if writer is not None:
                writer.add_scalar("train_loss", losses.val, global_step)
                writer.add_scalar("train_acc", accs.val, global_step)
            if cfg.DEBUG.DEBUG and "output" in metrics and "image" in batch:
                prefix = os.path.join(output_dir, f"train_{epoch}_{i}")
                save_debug_images(cfg, batch["image"], batch["joints"],
                                  batch["joints_vis"][..., None],
                                  np.asarray(metrics["target"]),
                                  np.asarray(metrics["output"]), prefix)
        if watchdog is not None:
            watchdog.beat()
        global_step += 1
    if trace_open:  # epoch shorter than the 13-step trace window
        jax.profiler.stop_trace()
        logger.info(f"=> wrote (short-epoch) profiler trace to {profile_dir}")
    return state, global_step


def main():
    args = parse_args("Train keypoints network")
    cfg = load_cfg_from_args(args)
    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    logger.info(f"JAX devices: {jax.devices()}")
    save_config_yaml(cfg, os.path.join(output_dir, "config.yaml"))

    n_dev = (cfg.TPU.NUM_DEVICES if cfg.TPU.NUM_DEVICES > 0
             else len(jax.devices()))
    mesh = get_mesh(n_dev)

    dtype = compute_dtype(cfg)
    model = get_pose_net(cfg, dtype=dtype)
    summary = get_model_summary(
        model, (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]))
    logger.info(summary["text"])
    # Default-on model-graph dump: the lowered StableHLO text is the JAX
    # analogue of the reference's TensorBoard add_graph
    # (tools/train.py:129-138).  FHPE_DUMP_HLO=0 disables.
    if os.environ.get("FHPE_DUMP_HLO", "1") != "0":
        from ..utils.summary import dump_hlo
        hlo_path = os.path.join(output_dir, "forward.stablehlo.txt")
        if dump_hlo(model, (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]),
                    hlo_path):
            logger.info(f"=> wrote lowered StableHLO to {hlo_path}")

    train_loader, val_loader, meta = build_loaders(cfg, n_dev)

    rng = jax.random.PRNGKey(int(cfg.TRAIN.get("SEED", 0)))
    sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0], 3))
    state = create_train_state(cfg, model, rng, sample)

    # ImageNet-pretrained trunk init (reference get_pose_net(is_train=True)
    # -> init_weights(cfg.MODEL.PRETRAINED), pose_resnet.py:261-268,
    # pose_hrnet.py:495-501)
    from ..utils.torch_import import load_pretrained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables, n_pre = load_pretrained(cfg, variables, logger)
    if n_pre:
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])

    # Weights-only warm-start from an explicit checkpoint, mirroring the
    # reference's student warm-start (tools/fpd_train.py:169-172); epoch
    # and optimizer state start fresh (AUTO_RESUME below restores those
    # when continuing the same run dir).
    if cfg.TRAIN.CHECKPOINT:
        if not os.path.exists(cfg.TRAIN.CHECKPOINT):
            # fail loudly like the reference's unconditional load
            # (fpd_train.py:169-172): a typo'd path must not silently
            # turn a warm-started run into a from-scratch run
            raise SystemExit(
                f"TRAIN.CHECKPOINT not found: {cfg.TRAIN.CHECKPOINT}")
        from flax import serialization
        from ..utils.checkpoint import load_model_weights
        w = load_model_weights(cfg.TRAIN.CHECKPOINT)
        params = serialization.from_state_dict(state.params, w["params"])
        # weights-only semantics: the optimizer starts fresh ON the loaded
        # weights (the reference warm-start loads the model state_dict and
        # constructs the optimizer afterwards, fpd_train.py:169-183);
        # re-init also keeps opt-state leaf dtypes in lockstep with the
        # loaded params (a float64 import must not ride f32 Adam moments)
        state = state.replace(
            params=params,
            batch_stats=serialization.from_state_dict(
                state.batch_stats, w["batch_stats"]),
            opt_state=state.tx.init(params))
        logger.info(f"=> warm-started weights from {cfg.TRAIN.CHECKPOINT}")

    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_perf = -1.0
    if cfg.AUTO_RESUME:
        state, ckpt_epoch, ckpt_perf = auto_resume_multihost(output_dir, state)
        if ckpt_epoch is not None:
            begin_epoch = ckpt_epoch
            best_perf = ckpt_perf
            logger.info(f"=> auto-resumed from epoch {begin_epoch} "
                        f"(best perf {best_perf:.4f})")

    prepare = (make_batch_preprocessor(cfg, meta["joints_weight"])
               if cfg.TPU.DEVICE_PREPROCESS else None)
    step_fn = make_train_step(model, cfg, mesh, is_multi_output(model),
                              prepare=prepare,
                              debug_outputs=cfg.DEBUG.DEBUG
                              and jax.process_count() == 1)
    evaluate_fn = make_evaluate_fn(cfg)

    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir=tb_dir)
    except Exception:
        logger.info("tensorboardX unavailable; skipping TB logging")

    from ..utils.checkpoint import flush_pending
    from ..utils.watchdog import StallWatchdog
    watchdog = StallWatchdog(
        float(cfg.TPU.get("STALL_TIMEOUT_S", 0)), logger=logger,
        on_stall=[lambda: flush_pending(output_dir)])
    if watchdog.enabled:
        logger.info(f"=> stall watchdog armed on first step "
                    f"(timeout {watchdog.timeout_s:.0f}s, exit 86)")

    global_step = 0
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        state = set_lr(state, lr_for_epoch(cfg, epoch))
        state, global_step = train_one_epoch(
            cfg, train_loader, step_fn, state, mesh, epoch, logger, writer,
            global_step, output_dir, watchdog=watchdog)

        eval_freq = max(1, int(cfg.TRAIN.get("EVAL_FREQ", 1)))
        if not ((epoch + 1) % eval_freq == 0
                or epoch + 1 == cfg.TRAIN.END_EPOCH):
            continue
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        eval_mesh, eval_vars, run_eval = multihost_eval_setup(mesh, variables)
        if run_eval:
            perf, name_values, *_ = validate(
                cfg, model, eval_vars, val_loader, eval_mesh, meta, logger,
                is_multi_output(model), evaluate_fn, output_dir,
                writer=writer, global_step=epoch, watchdog=watchdog)
            if writer is not None:
                writer.add_scalar("valid_perf", float(perf), epoch)

            is_best = perf >= best_perf
            best_perf = max(perf, best_perf)
            ckpt_freq = max(1, int(cfg.TRAIN.get("CKPT_FREQ", 1)))
            if ((epoch + 1) % (eval_freq * ckpt_freq) == 0
                    or epoch + 1 == cfg.TRAIN.END_EPOCH):
                logger.info(f"=> saving checkpoint to {output_dir} "
                            f"(perf {perf:.4f}, best {best_perf:.4f})")
                save_checkpoint(output_dir, state, epoch + 1, perf, is_best)
            elif is_best:
                # CKPT_FREQ skipped the rolling checkpoint, but best_perf
                # ratchets every eval — snapshot model_best now or these
                # weights are lost and later epochs can't re-qualify.
                from ..utils.checkpoint import save_best
                save_best(output_dir, state)

    if is_main_process():
        save_final_state(output_dir, state)
        logger.info(f"=> saved final state to {output_dir}")
    watchdog.stop()
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
