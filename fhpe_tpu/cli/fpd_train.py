"""FPD distillation training CLI.

Equivalent of the reference ``tools/fpd_train.py``: student config via
``--cfg``, teacher via ``--tcfg``; teacher weights from ``KD.TEACHER``
(required — the reference's NORMAL mode crashes on an undefined teacher,
fpd_train.py:244, and is intentionally not supported here either); both
models validated before epoch 0 as a sanity check; per-epoch FPD step with
``loss = (1-alpha)*MSE(student, gt) + alpha*MSE(student, teacher)``.

Usage:
  python -m fhpe_tpu.cli.fpd_train --cfg <student.yaml> --tcfg <teacher.yaml>
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..models import get_pose_net, is_multi_output
from ..parallel.mesh import get_mesh
from ..train.state import create_train_state, lr_for_epoch, set_lr
from ..train.step import make_batch_preprocessor, make_fpd_train_step
from ..utils.checkpoint import (auto_resume_multihost, load_model_weights,
                                save_checkpoint, save_final_state)
from ..utils.dtype import compute_dtype
from ..utils.logger import create_logger, save_config_yaml
from ..utils.summary import get_model_summary
from .common import (build_loaders, is_main_process, load_cfg_from_args,
                     make_evaluate_fn, multihost_eval_setup, parse_args,
                     validate)
from ..utils.logger import WindowedMeters


def fpd_train_one_epoch(cfg, loader, step_fn, state, tvars, mesh, epoch,
                        logger, writer=None, global_step=0, output_dir="",
                        watchdog=None):
    from ..parallel.mesh import prefetch_to_device
    from .common import train_batch_keys

    meters = WindowedMeters(value_keys=("loss", "pose_loss", "kd_loss"))
    stream = prefetch_to_device(iter(loader), mesh, keys=train_batch_keys(cfg))
    for i, (dev, batch) in enumerate(stream):
        state, metrics = step_fn(state, tvars, dev)
        meters.push(metrics, batch["joints"].shape[0])
        if i % cfg.PRINT_FREQ == 0:
            meters.drain()
            losses, accs = meters["loss"], meters["acc"]
            pose_losses, kd_losses = meters["pose_loss"], meters["kd_loss"]
            logger.info(
                f"Epoch: [{epoch}][{i}/{len(loader)}]  "
                f"Time {meters.batch_time.val:.3f}s  "
                f"Speed {meters.speed:.1f} samples/s  "
                f"Loss {losses.val:.5f} ({losses.avg:.5f})  "
                f"PoseLoss {pose_losses.val:.5f}  KDLoss {kd_losses.val:.5f}  "
                f"Accuracy {accs.val:.3f} ({accs.avg:.3f})")
            if writer is not None:
                writer.add_scalar("train_loss", losses.val, global_step)
                writer.add_scalar("train_pose_loss", pose_losses.val,
                                  global_step)
                writer.add_scalar("train_kd_pose_loss", kd_losses.val,
                                  global_step)
                writer.add_scalar("train_acc", accs.val, global_step)
            if cfg.DEBUG.DEBUG and "output" in metrics and "image" in batch:
                import numpy as np
                from ..utils.vis import save_debug_images
                prefix = os.path.join(output_dir, f"fpd_{epoch}_{i}")
                save_debug_images(cfg, batch["image"], batch["joints"],
                                  batch["joints_vis"][..., None],
                                  np.asarray(metrics["target"]),
                                  np.asarray(metrics["output"]), prefix)
        if watchdog is not None:
            watchdog.beat()
        global_step += 1
    return state, global_step


def main():
    args = parse_args("FPD distillation training", teacher=True)
    cfg = load_cfg_from_args(args)
    if cfg.KD.TRAIN_TYPE != "FPD":
        raise SystemExit(
            "KD.TRAIN_TYPE must be 'FPD' for fpd_train (the reference's "
            "NORMAL branch is broken upstream, fpd_train.py:244; use "
            "cli.train for normal training)")
    if not cfg.KD.TEACHER or not os.path.exists(cfg.KD.TEACHER):
        raise SystemExit(f"KD.TEACHER checkpoint not found: {cfg.KD.TEACHER}")

    # teacher cfg: clone of student cfg merged with the teacher file
    # (reference fpd_train.py:128-131)
    tcfg = cfg.clone()
    tcfg.defrost()
    tcfg.merge_from_file(args.tcfg)
    tcfg.freeze()

    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "fpd_train")
    logger.info(f"JAX devices: {jax.devices()}")
    save_config_yaml(cfg, os.path.join(output_dir, "config.yaml"))
    save_config_yaml(tcfg, os.path.join(output_dir, "teacher_config.yaml"))

    n_dev = (cfg.TPU.NUM_DEVICES if cfg.TPU.NUM_DEVICES > 0
             else len(jax.devices()))
    mesh = get_mesh(n_dev)
    dtype = compute_dtype(cfg)

    student = get_pose_net(cfg, dtype=dtype)
    teacher = get_pose_net(tcfg, dtype=dtype)
    logger.info("Student:\n" + get_model_summary(
        student, (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]))["text"])
    logger.info("Teacher:\n" + get_model_summary(
        teacher, (tcfg.MODEL.IMAGE_SIZE[1], tcfg.MODEL.IMAGE_SIZE[0]))["text"])

    # model-graph substitute (tools/train.py:129-138): lowered StableHLO
    # of the student forward; FHPE_DUMP_HLO=0 disables
    if os.environ.get("FHPE_DUMP_HLO", "1") != "0":
        from ..utils.summary import dump_hlo
        hlo_path = os.path.join(output_dir, "student_forward.stablehlo.txt")
        if dump_hlo(student,
                    (cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0]),
                    hlo_path):
            logger.info(f"=> wrote lowered StableHLO to {hlo_path}")

    train_loader, val_loader, meta = build_loaders(cfg, n_dev)

    rng = jax.random.PRNGKey(int(cfg.TRAIN.get("SEED", 0)))
    sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0], 3))
    state = create_train_state(cfg, student, rng, sample)

    # student ImageNet-pretrained trunk init (reference fpd_train.py:122 ->
    # get_pose_net(is_train=True) -> init_weights(PRETRAINED)); the teacher
    # is built with is_train=False and loads KD.TEACHER instead
    from ..utils.torch_import import load_pretrained
    svars = {"params": state.params, "batch_stats": state.batch_stats}
    svars, n_pre = load_pretrained(cfg, svars, logger)
    if n_pre:
        state = state.replace(params=svars["params"],
                              batch_stats=svars["batch_stats"])

    tvars = load_model_weights(cfg.KD.TEACHER)
    # validate checkpoint structure against a fresh init
    t_init = teacher.init(jax.random.PRNGKey(1), sample, train=False)
    from flax import serialization
    tvars = serialization.from_state_dict(t_init, tvars)
    # Commit the frozen teacher to device ONCE, replicated over the mesh.
    # The msgpack restore yields numpy leaves, and numpy arguments are
    # re-transferred on EVERY jitted call — measured ~10x slower FPD
    # steps through the relay (~100 MB of teacher weights per step) until
    # this device_put.  Multi-host keeps host arrays (a single-controller
    # device_put cannot target non-addressable devices); that path keeps
    # the per-step transfer, but over local PCIe rather than this box's
    # relay, and is not a benched configuration.
    if jax.process_count() == 1:
        from ..parallel.mesh import replicated
        tvars = jax.device_put(tvars, replicated(mesh))

    # student warm-start (reference fpd_train.py:169-172; like it, a set
    # but missing path fails loudly instead of silently training fresh)
    if cfg.TRAIN.CHECKPOINT:
        if not os.path.exists(cfg.TRAIN.CHECKPOINT):
            raise SystemExit(
                f"TRAIN.CHECKPOINT not found: {cfg.TRAIN.CHECKPOINT}")
        w = load_model_weights(cfg.TRAIN.CHECKPOINT)
        params = serialization.from_state_dict(state.params, w["params"])
        # weights-only: fresh optimizer on the loaded weights (reference
        # constructs the optimizer after load_state_dict,
        # fpd_train.py:169-183), and opt-state dtypes track the import
        state = state.replace(
            params=params,
            batch_stats=serialization.from_state_dict(
                state.batch_stats, w["batch_stats"]),
            opt_state=state.tx.init(params))
        logger.info(f"=> student warm-started from {cfg.TRAIN.CHECKPOINT}")

    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_perf = -1.0
    if cfg.AUTO_RESUME:
        state, ckpt_epoch, ckpt_perf = auto_resume_multihost(output_dir, state)
        if ckpt_epoch is not None:
            begin_epoch, best_perf = ckpt_epoch, ckpt_perf
            logger.info(f"=> auto-resumed from epoch {begin_epoch}")

    prepare = (make_batch_preprocessor(cfg, meta["joints_weight"])
               if cfg.TPU.DEVICE_PREPROCESS else None)
    step_fn = make_fpd_train_step(
        student, teacher, cfg, mesh, is_multi_output(student),
        is_multi_output(teacher), prepare=prepare,
        debug_outputs=cfg.DEBUG.DEBUG and jax.process_count() == 1,
        teacher_cfg=tcfg)
    evaluate_fn = make_evaluate_fn(cfg)

    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(log_dir=tb_dir)
    except Exception:
        pass

    from ..utils.checkpoint import flush_pending
    from ..utils.watchdog import StallWatchdog
    watchdog = StallWatchdog(
        float(cfg.TPU.get("STALL_TIMEOUT_S", 0)), logger=logger,
        on_stall=[lambda: flush_pending(output_dir)])
    if watchdog.enabled:
        logger.info(f"=> stall watchdog armed on first step "
                    f"(timeout {watchdog.timeout_s:.0f}s, exit 86)")

    # pre-training sanity validation of both models (fpd_train.py:242-250)
    eval_mesh, eval_tvars, run_eval = multihost_eval_setup(mesh, tvars)
    if run_eval:
        logger.info("=> validating teacher before training")
        tperf, *_ = validate(cfg, teacher, eval_tvars, val_loader, eval_mesh,
                             meta, logger, is_multi_output(teacher),
                             evaluate_fn, output_dir)
        logger.info(f"=> teacher perf: {tperf:.4f}")
        logger.info("=> validating student before training")
        svars = {"params": state.params, "batch_stats": state.batch_stats}
        _, eval_svars, _ = multihost_eval_setup(mesh, svars)
        sperf, *_ = validate(cfg, student, eval_svars, val_loader, eval_mesh,
                             meta, logger, is_multi_output(student),
                             evaluate_fn, output_dir)
        logger.info(f"=> student perf: {sperf:.4f}")

    global_step = 0
    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        state = set_lr(state, lr_for_epoch(cfg, epoch))
        state, global_step = fpd_train_one_epoch(
            cfg, train_loader, step_fn, state, tvars, mesh, epoch, logger,
            writer, global_step, output_dir, watchdog=watchdog)

        eval_freq = max(1, int(cfg.TRAIN.get("EVAL_FREQ", 1)))
        if not ((epoch + 1) % eval_freq == 0
                or epoch + 1 == cfg.TRAIN.END_EPOCH):
            continue
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        eval_mesh, eval_vars, run_eval = multihost_eval_setup(mesh, variables)
        if run_eval:
            perf, *_ = validate(cfg, student, eval_vars, val_loader,
                                eval_mesh, meta, logger,
                                is_multi_output(student), evaluate_fn,
                                output_dir, writer=writer, global_step=epoch,
                                watchdog=watchdog)
            if writer is not None:
                writer.add_scalar("valid_perf", float(perf), epoch)

            is_best = perf >= best_perf
            best_perf = max(perf, best_perf)
            ckpt_freq = max(1, int(cfg.TRAIN.get("CKPT_FREQ", 1)))
            if ((epoch + 1) % (eval_freq * ckpt_freq) == 0
                    or epoch + 1 == cfg.TRAIN.END_EPOCH):
                save_checkpoint(output_dir, state, epoch + 1, perf, is_best)
                logger.info(f"=> checkpoint saved (perf {perf:.4f}, "
                            f"best {best_perf:.4f})")
            elif is_best:
                # CKPT_FREQ skipped the rolling checkpoint, but best_perf
                # ratchets every eval — snapshot model_best now or these
                # weights are lost and later epochs can't re-qualify.
                from ..utils.checkpoint import save_best
                save_best(output_dir, state)

    if is_main_process():
        save_final_state(output_dir, state)
    watchdog.stop()
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
