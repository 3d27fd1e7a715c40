"""Jitted SPMD train / FPD / eval steps.

The reference's hot loops (``lib/core/function.py:28-332``) become three
jit-compiled SPMD programs over a 1-D ``data`` mesh:

* ``make_train_step`` — forward, fused loss, backward, ``pmean`` gradient
  allreduce over ICI, optimizer update, on-device PCK counts.  Replaces the
  per-step DataParallel scatter/gather + host numpy accuracy
  (function.py:46-70).
* ``make_fpd_train_step`` — adds the teacher forward (eval mode,
  ``stop_gradient`` — deliberately fixing the reference's non-detached
  teacher forward, function.py:120-122) and the
  ``(1-alpha)*pose + alpha*kd`` mixing (function.py:134).
* ``make_eval_step`` — forward with optional on-device flip-test
  (input W-flip, ``flip_back``, SHIFT_HEATMAP 1-px right shift, 0.5 average;
  function.py:218-240) and on-device decode; only (x, y, conf) per joint
  returns to the host.

BatchNorm under data parallelism: statistics are computed **per device**
(DataParallel computes per-replica stats), and the running stats kept are
device 0's — matching DataParallel, where only the master replica's buffer
updates persist.  ``bn_stats="mean"`` (cross-device mean, statistically
nicer) is also available.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..geometry.flip import flip_back_jax
from ..geometry.targets import generate_target_jax
from ..ops.decode import decode_heatmaps_jax, get_max_preds_jax
from ..ops.preprocess import normalize_images_jax, warp_affine_jax
from ..parallel.mesh import DATA_AXIS
from .loss import fpd_loss, stacked_mse_loss, stacked_ohkm_loss
from .state import TrainState


def make_batch_preprocessor(cfg, joints_weight=None):
    """Fused on-device preprocessing closure (TPU.DEVICE_PREPROCESS).

    Input batches carry raw uint8 crops + joint coords; the step normalizes
    (/255, mean/std) and stamps Gaussian targets on device — the
    north-star fusion replacing the reference's host-side ToTensor/
    Normalize + generate_target (JointsDataset.py:174-181).  Returns a
    function mapping the raw batch to {image, target, target_weight, ...}.
    """
    img_size = tuple(cfg.MODEL.IMAGE_SIZE)      # (W, H)
    hm_size = tuple(cfg.MODEL.HEATMAP_SIZE)     # (W, H)
    sigma = cfg.MODEL.SIGMA
    use_diff = bool(cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT)
    jw = None
    if use_diff and joints_weight is not None:
        jw = jnp.asarray(np.asarray(joints_weight).reshape(-1))

    def prepare(batch):
        out = dict(batch)
        if "canvas" in batch:
            # TPU.DEVICE_WARP: batched bilinear crop from the letterbox
            # canvas, fused with normalize + target stamping below
            warped = warp_affine_jax(batch["canvas"], batch["warp_inv"],
                                     img_size)
            out["image"] = normalize_images_jax(warped)
        elif "target" in batch:
            return batch
        else:
            out["image"] = normalize_images_jax(batch["image"])
        if "target" not in batch:
            target, tw = generate_target_jax(
                batch["joints"], batch["joints_vis"], hm_size, img_size,
                sigma, joints_weight=jw, use_different_joints_weight=use_diff)
            # targets NHWC to match model output layout
            out["target"] = jnp.transpose(target, (0, 2, 3, 1))
            out["target_weight"] = tw
        return out

    return prepare


def _identity_prepare(batch):
    if "target" in batch and batch["image"].dtype != jnp.uint8:
        return batch
    out = dict(batch)
    if batch["image"].dtype == jnp.uint8:
        out["image"] = normalize_images_jax(batch["image"])
    return out


def _select_device0(tree, axis):
    """Every device receives device 0's values (masked psum; tiny tensors)."""
    idx = jax.lax.axis_index(axis)
    return jax.tree_util.tree_map(
        lambda s: jax.lax.psum(
            jnp.where(idx == 0, s, jnp.zeros_like(s)), axis),
        tree,
    )


def _pck_counts(output, target, sample_mask=None):
    """Local (hits, valids) per joint for the global-PCK meter.

    output/target NHWC.  Matches accuracy semantics (eval/pck.py) but
    returns summable counts so devices combine exactly.  ``sample_mask``
    (B,) excludes padded rows of the dataset tail.
    """
    pred, _ = get_max_preds_jax(output)
    gt, _ = get_max_preds_jax(target)
    h, w = output.shape[1], output.shape[2]
    norm = jnp.array([h / 10.0, w / 10.0], dtype=jnp.float32)
    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)
    if sample_mask is not None:
        valid = valid & (sample_mask > 0)[:, None]
    d = jnp.linalg.norm((pred - gt) / norm, axis=-1)
    hit = (d < 0.5) & valid
    return jnp.sum(hit, axis=0), jnp.sum(valid, axis=0)  # (J,), (J,)


def _per_sample_loss(output, target, target_weight, use_ohkm, topk):
    """Per-sample criterion value (B,), reference loss semantics per row."""
    diff = output - target
    if target_weight is not None:
        diff = diff * target_weight[:, None, None, :]
    if use_ohkm:
        per_joint = 0.5 * jnp.mean(jnp.square(diff), axis=(-3, -2))  # (B, J)
        top, _ = jax.lax.top_k(per_joint, topk)
        return jnp.sum(top, axis=-1) / topk
    return 0.5 * jnp.mean(jnp.square(diff), axis=(-3, -2, -1))


def _finalize_pck(hits, valids):
    """Macro PCK (reference accuracy(): per-joint acc averaged over joints
    with valid samples; cnt = number of counted joints, evaluate.py:62-68)."""
    per_joint = jnp.where(valids > 0, hits / jnp.maximum(valids, 1), -1.0)
    has = per_joint >= 0
    cnt = jnp.sum(has)
    avg = jnp.where(cnt > 0,
                    jnp.sum(jnp.where(has, per_joint, 0.0)) / jnp.maximum(cnt, 1),
                    0.0)
    return per_joint, avg, cnt


def _last_output(outputs, multi_output: bool):
    return outputs[-1] if multi_output else outputs


def _resolve_bn_stats(cfg, bn_stats):
    """Resolve + validate the BN-stats reconciliation mode.

    Only "device0" (DataParallel-faithful) and "mean" are valid under the
    SPMD steps: state is emitted replicated (out_specs P()), so per-device
    ("local") stats would silently yield unspecified values with
    check_vma=False.
    """
    if bn_stats is None:
        bn_stats = cfg.TPU.get("BN_STATS", "device0")
    if bn_stats not in ("device0", "mean"):
        raise ValueError(
            f"TPU.BN_STATS must be 'device0' or 'mean', got '{bn_stats}'")
    return bn_stats


def make_train_step(model, cfg, mesh, multi_output: bool,
                    bn_stats: str | None = None, prepare=None,
                    debug_outputs: bool = False) -> Callable:
    """Returns jitted ``(state, batch) -> (state, metrics)``.

    batch: {"image" (B,H,W,3), "target" (B,h,w,J), "target_weight" (B,J)}
    sharded on the leading axis; state replicated.  With a ``prepare``
    closure (make_batch_preprocessor) the batch instead carries raw uint8
    crops + joints and preprocessing fuses into the step on device.
    """
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    use_ohkm = bool(cfg.LOSS.USE_OHKM)
    topk = int(cfg.LOSS.TOPK)
    prepare = prepare or _identity_prepare
    bn_stats = _resolve_bn_stats(cfg, bn_stats)

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        tw = batch["target_weight"] if use_tw else None
        if use_ohkm:
            loss = stacked_ohkm_loss(outputs, batch["target"], tw, topk)
        else:
            loss = stacked_mse_loss(outputs, batch["target"], tw)
        return loss, (mutated["batch_stats"],
                      _last_output(outputs, multi_output))

    def step(state: TrainState, batch):
        batch = prepare(batch)
        (loss, (new_stats, final)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)

        if bn_stats == "device0":
            new_stats = _select_device0(new_stats, DATA_AXIS)
        elif bn_stats == "mean":
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)

        state = state.apply_gradients(grads).replace(batch_stats=new_stats)

        hits, valids = _pck_counts(final, batch["target"])
        hits = jax.lax.psum(hits, DATA_AXIS)
        valids = jax.lax.psum(valids, DATA_AXIS)
        per_joint, avg, cnt = _finalize_pck(hits, valids)
        metrics = {"loss": loss, "acc": avg, "acc_cnt": cnt,
                   "per_joint_acc": per_joint}
        if debug_outputs:
            metrics["output"] = final
            metrics["target"] = batch["target"]
        return state, metrics

    metric_specs = {"loss": P(), "acc": P(), "acc_cnt": P(),
                    "per_joint_acc": P()}
    if debug_outputs:
        metric_specs["output"] = P(DATA_AXIS)
        metric_specs["target"] = P(DATA_AXIS)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), metric_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_fpd_train_step(model, teacher_model, cfg, mesh,
                        multi_output: bool, teacher_multi_output: bool,
                        bn_stats: str | None = None, prepare=None,
                        debug_outputs: bool = False,
                        teacher_cfg=None) -> Callable:
    """FPD distillation step: ``(state, teacher_vars, batch) -> (state, metrics)``.

    ``teacher_vars`` = {"params", "batch_stats"} (frozen; eval-mode forward).
    The KD term's target-weight flag comes from the TEACHER config (the
    reference builds kd_pose_criterion from tcfg, fpd_train.py:145-147);
    pass ``teacher_cfg`` for that fidelity — defaults to the student's.
    """
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    use_tw_kd = bool((teacher_cfg or cfg).LOSS.USE_TARGET_WEIGHT)
    alpha = float(cfg.KD.ALPHA)
    prepare = prepare or _identity_prepare
    bn_stats = _resolve_bn_stats(cfg, bn_stats)

    def loss_fn(params, batch_stats, teacher_final, batch):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        total, pose, kd = fpd_loss(
            outputs, teacher_final, batch["target"], batch["target_weight"],
            alpha, use_target_weight_pose=use_tw,
            use_target_weight_kd=use_tw_kd)
        return total, (pose, kd, mutated["batch_stats"],
                       _last_output(outputs, multi_output))

    def step(state: TrainState, teacher_vars, batch):
        batch = prepare(batch)
        t_out = teacher_model.apply(teacher_vars, batch["image"], train=False)
        teacher_final = jax.lax.stop_gradient(
            _last_output(t_out, teacher_multi_output))

        (loss, (pose, kd, new_stats, final)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   teacher_final, batch)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss, pose, kd = jax.lax.pmean((loss, pose, kd), DATA_AXIS)

        if bn_stats == "device0":
            new_stats = _select_device0(new_stats, DATA_AXIS)
        elif bn_stats == "mean":
            new_stats = jax.lax.pmean(new_stats, DATA_AXIS)

        state = state.apply_gradients(grads).replace(batch_stats=new_stats)

        hits, valids = _pck_counts(final, batch["target"])
        hits = jax.lax.psum(hits, DATA_AXIS)
        valids = jax.lax.psum(valids, DATA_AXIS)
        per_joint, avg, cnt = _finalize_pck(hits, valids)
        metrics = {"loss": loss, "pose_loss": pose, "kd_loss": kd,
                   "acc": avg, "acc_cnt": cnt, "per_joint_acc": per_joint}
        if debug_outputs:
            metrics["output"] = final
            metrics["target"] = batch["target"]
        return state, metrics

    metric_specs = {"loss": P(), "pose_loss": P(), "kd_loss": P(),
                    "acc": P(), "acc_cnt": P(), "per_joint_acc": P()}
    if debug_outputs:
        metric_specs["output"] = P(DATA_AXIS)
        metric_specs["target"] = P(DATA_AXIS)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=(P(), metric_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(model, cfg, mesh, multi_output: bool,
                   flip_perm=None, prepare=None,
                   debug_outputs: bool = False) -> Callable:
    """Returns jitted ``(variables, batch) -> outputs``.

    batch: {"image", "target", "target_weight", "inv_trans" (B,2,3)}.
    outputs: {"preds" (B,J,2) source-image coords, "maxvals" (B,J),
              "loss" (), "hits"/"valids" (J,)} — per-sample arrays sharded
    back to the host, meters reduced across devices.  With
    ``debug_outputs`` the (flip-averaged) heatmaps and targets also return
    for DEBUG.* image dumps (reference function.py:286-289).
    """
    use_tw = bool(cfg.LOSS.USE_TARGET_WEIGHT)
    use_ohkm = bool(cfg.LOSS.USE_OHKM)
    topk = int(cfg.LOSS.TOPK)
    flip_test = bool(cfg.TEST.FLIP_TEST)
    shift_heatmap = bool(cfg.TEST.SHIFT_HEATMAP)
    post_process = bool(cfg.TEST.POST_PROCESS)
    if flip_test and flip_perm is None:
        raise ValueError("flip_perm is required when TEST.FLIP_TEST")
    perm = None if flip_perm is None else jnp.asarray(flip_perm)
    prepare = prepare or _identity_prepare

    def fwd(variables, images):
        out = model.apply(variables, images, train=False)
        return _last_output(out, multi_output)

    def step(variables, batch):
        batch = prepare(batch)
        output = fwd(variables, batch["image"])
        if flip_test:
            flipped = fwd(variables, batch["image"][:, :, ::-1, :])
            flipped = flip_back_jax(flipped, perm)
            if shift_heatmap:
                # reference: col 0 kept, cols 1: get cols 0:-1
                # (function.py:236-238)
                flipped = jnp.concatenate(
                    [flipped[:, :, :1, :], flipped[:, :, :-1, :]], axis=2)
            output = (output + flipped) * 0.5

        tw = batch["target_weight"] if use_tw else None
        # mask out padded dataset-tail rows from the meters; the criterion
        # matches training (OHKM when enabled), as the reference's validate
        # uses the train criterion (function.py:245)
        mask = batch.get("valid")
        if mask is None:
            mask = jnp.ones(output.shape[0], jnp.float32)
        mask = mask.astype(jnp.float32)
        per_sample = _per_sample_loss(output, batch["target"], tw,
                                      use_ohkm, topk)
        loss_sum = jax.lax.psum(jnp.sum(per_sample * mask), DATA_AXIS)
        n_valid = jax.lax.psum(jnp.sum(mask), DATA_AXIS)
        loss = loss_sum / jnp.maximum(n_valid, 1.0)

        preds, maxvals = decode_heatmaps_jax(output, batch["inv_trans"],
                                             post_process)
        hits, valids = _pck_counts(output, batch["target"], mask)
        hits = jax.lax.psum(hits, DATA_AXIS)
        valids = jax.lax.psum(valids, DATA_AXIS)
        result = {"preds": preds, "maxvals": maxvals, "loss": loss,
                  "hits": hits, "valids": valids}
        if debug_outputs:
            result["output"] = output
            result["target"] = batch["target"]
        return result

    out_specs = {"preds": P(DATA_AXIS), "maxvals": P(DATA_AXIS),
                 "loss": P(), "hits": P(), "valids": P()}
    if debug_outputs:
        out_specs["output"] = P(DATA_AXIS)
        out_specs["target"] = P(DATA_AXIS)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
