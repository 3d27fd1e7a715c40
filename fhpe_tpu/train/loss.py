"""Heatmap losses: joints MSE, OHKM, and the FPD distillation objective.

Behavioral equivalents of the reference ``lib/core/loss.py`` and the FPD
loss mixing in ``lib/core/function.py:127-140`` — but as single fused jnp
expressions instead of per-joint Python loops, so XLA emits one reduction
kernel per loss (the reference's per-joint loop launches J small CUDA ops).

Shapes: heatmaps are NHWC ``(B, H, W, J)``; stacked-hourglass outputs carry a
leading stacks axis ``(S, B, H, W, J)`` which broadcasting handles for free.
``target_weight`` is ``(B, J)``.

Reference equivalence of the fused form: the reference computes
``(1/J) * sum_j 0.5 * mean_{B,HW}((w_j p_j - w_j g_j)^2)`` which equals
``0.5 * mean_{B,J,HW}(w^2 (p - g)^2)`` because every per-joint mean has the
same element count (loss.py:28-39).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def joints_mse_loss(output, target, target_weight=None):
    """0.5 * weighted MSE over heatmaps, averaged per reference convention.

    output/target: (..., B, H, W, J); target_weight: (B, J) or None.
    A leading stacks axis sums (reference sums per-stack losses,
    function.py:49-56) — pass ``sum_leading=True`` via ``stacked_mse_loss``.
    """
    diff = output - target
    if target_weight is not None:
        w = target_weight[:, None, None, :]  # (B, 1, 1, J)
        diff = diff * w
    return 0.5 * jnp.mean(jnp.square(diff), axis=(-4, -3, -2, -1))


def stacked_mse_loss(outputs, target, target_weight=None):
    """Per-stack MSE summed over the leading stacks axis (if present).

    Matches the reference's ``for o in outputs: loss += criterion(...)``
    for list outputs and plain criterion for single tensors.
    """
    per = joints_mse_loss(outputs, target, target_weight)
    return jnp.sum(per)  # scalar for single-output; sum over stacks otherwise


def joints_ohkm_mse_loss(output, target, target_weight=None, topk: int = 8):
    """Online hard keypoint mining MSE (loss.py:42-84).

    Per-sample per-joint 0.5*weighted-MSE, keep the top-k joint losses per
    sample, average (sum/k) over the batch.
    """
    diff = output - target
    if target_weight is not None:
        diff = diff * target_weight[:, None, None, :]
    per_joint = 0.5 * jnp.mean(jnp.square(diff), axis=(-3, -2))  # (..., B, J)
    top, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(top, axis=-1) / topk, axis=-1)


def stacked_ohkm_loss(outputs, target, target_weight=None, topk: int = 8):
    return jnp.sum(joints_ohkm_mse_loss(outputs, target, target_weight, topk))


def fpd_loss(student_out, teacher_final, target, target_weight=None,
             alpha: float = 0.5, use_target_weight_pose: bool = True,
             use_target_weight_kd: bool = True):
    """FPD objective: (1-alpha)*MSE(student, gt) + alpha*MSE(student, teacher).

    ``teacher_final`` is the teacher's LAST heatmap (function.py:121-122),
    already stop-gradiented by the caller (the reference leaks gradients into
    the teacher forward — correctness-neutral waste we deliberately avoid,
    function.py:120; SURVEY.md section 3.2).  For stacked students both terms
    are summed per stack against the same targets (function.py:127-133).

    The pose and KD terms gate the target weight independently: the
    reference builds the pose criterion from the student config and the KD
    criterion from the TEACHER config (fpd_train.py:145-147,177-179).

    Returns (total, pose_loss, kd_loss).
    """
    pose_w = target_weight if use_target_weight_pose else None
    kd_w = target_weight if use_target_weight_kd else None
    pose = stacked_mse_loss(student_out, target, pose_w)
    kd = stacked_mse_loss(student_out, teacher_final, kd_w)
    total = (1.0 - alpha) * pose + alpha * kd
    return total, pose, kd
