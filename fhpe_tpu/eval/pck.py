"""In-training PCK proxy metric.

Behavioral equivalent of the reference ``lib/core/evaluate.py``: decode the
argmax of predicted and ground-truth heatmaps, normalize distances by
heatmap_size/10, count the fraction below 0.5 per joint, ignoring joints
whose gt location is at most 1 in either coordinate.

The JAX version runs fully on device inside the jitted train step — the
reference instead copies the output tensor to the host and runs numpy every
step (function.py:68, a per-step D2H sync this build eliminates).

Reference quirk preserved: the normalizer pairs ``[h, w] / 10`` against
``(x, y)`` coords (evaluate.py:55) — i.e. x is normalized by h/10 and y by
w/10.  Identical for square heatmaps; faithfully wrong for 64x48.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops.decode import get_max_preds, get_max_preds_jax


def accuracy_np(output: np.ndarray, target: np.ndarray, thr: float = 0.5):
    """numpy oracle; output/target are NCHW (B, J, H, W).

    Returns (acc (J+1,), avg_acc, cnt, pred): acc[0] is the average over
    joints with any valid sample; acc[i+1] the per-joint PCK or -1.
    """
    pred, _ = get_max_preds(output)
    gt, _ = get_max_preds(target)
    h, w = output.shape[2], output.shape[3]
    norm = np.ones((pred.shape[0], 2)) * np.array([h, w]) / 10

    num_joints = output.shape[1]
    dists = np.zeros((num_joints, pred.shape[0]))
    for n in range(pred.shape[0]):
        for c in range(num_joints):
            if gt[n, c, 0] > 1 and gt[n, c, 1] > 1:
                dists[c, n] = np.linalg.norm(
                    pred[n, c, :] / norm[n] - gt[n, c, :] / norm[n])
            else:
                dists[c, n] = -1

    acc = np.zeros(num_joints + 1)
    avg_acc, cnt = 0.0, 0
    for i in range(num_joints):
        valid = dists[i] != -1
        nv = valid.sum()
        acc[i + 1] = (np.less(dists[i][valid], thr).sum() / nv) if nv > 0 else -1
        if acc[i + 1] >= 0:
            avg_acc += acc[i + 1]
            cnt += 1
    avg_acc = avg_acc / cnt if cnt != 0 else 0
    if cnt != 0:
        acc[0] = avg_acc
    return acc, avg_acc, cnt, pred


def accuracy_jax(output: jnp.ndarray, target: jnp.ndarray, thr: float = 0.5):
    """On-device PCK; output/target are NHWC (B, H, W, J).

    Returns (per_joint_acc (J,), avg_acc (), cnt ()): per-joint acc is -1
    where no valid sample exists, matching the oracle.
    """
    pred, _ = get_max_preds_jax(output)
    gt, _ = get_max_preds_jax(target)
    h, w = output.shape[1], output.shape[2]
    norm = jnp.array([h / 10.0, w / 10.0], dtype=jnp.float32)

    valid = (gt[..., 0] > 1) & (gt[..., 1] > 1)           # (B, J)
    d = jnp.linalg.norm((pred - gt) / norm, axis=-1)       # (B, J)
    hit = (d < thr) & valid
    nv = jnp.sum(valid, axis=0)                            # (J,)
    per_joint = jnp.where(nv > 0, jnp.sum(hit, axis=0) / jnp.maximum(nv, 1), -1.0)
    has = per_joint >= 0
    cnt = jnp.sum(has)
    avg = jnp.where(cnt > 0, jnp.sum(jnp.where(has, per_joint, 0.0)) / jnp.maximum(cnt, 1), 0.0)
    return per_joint, avg, cnt
