"""Gaussian target-heatmap generation.

Behavioral equivalent of ``JointsDataset.generate_target``
(reference ``lib/dataset/JointsDataset.py:233-289``): an unnormalized
Gaussian (peak 1) stamped in a ``6*sigma + 1`` window around each joint, with
the reference's exact truncation (``int(x/stride + 0.5)``, truncation toward
zero), out-of-bounds weight zeroing, and visibility gating.

Two implementations:
* :func:`generate_target_np` — scalar numpy, the parity oracle.
* :func:`generate_target_jax` — fully vectorized, jit/vmap-friendly, used by
  the fused on-device preprocessing path.  Instead of window-stamping it
  evaluates the Gaussian at every heatmap pixel and masks to the window,
  which is mathematically identical and maps to pure VPU elementwise work.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def generate_target_np(joints, joints_vis, heatmap_size, image_size, sigma,
                       joints_weight=None, use_different_joints_weight=False):
    """Single-sample numpy target generator.

    joints: (J, 3) float; joints_vis: (J, 3) (only column 0 is used).
    heatmap_size / image_size: (width, height).
    Returns (target (J, H, W) float32, target_weight (J, 1) float32).
    """
    num_joints = joints.shape[0]
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    stride = (np.asarray(image_size, dtype=np.float64)
              / np.asarray(heatmap_size, dtype=np.float64))
    tmp_size = sigma * 3  # float when sigma is float, as in the reference

    target = np.zeros((num_joints, h, w), dtype=np.float32)
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]

    for j in range(num_joints):
        mu_x = int(joints[j][0] / stride[0] + 0.5)
        mu_y = int(joints[j][1] / stride[1] + 0.5)
        # int() placement matches JointsDataset.py:258-259 exactly (matters
        # for non-integer sigma)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= w or ul[1] >= h or br[0] < 0 or br[1] < 0:
            target_weight[j] = 0
            continue
        if target_weight[j] > 0.5:
            size = 2 * tmp_size + 1
            x = np.arange(0, size, 1, np.float32)
            y = x[:, np.newaxis]
            x0 = y0 = size // 2
            g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
            g_x = max(0, -ul[0]), min(br[0], w) - ul[0]
            g_y = max(0, -ul[1]), min(br[1], h) - ul[1]
            img_x = max(0, ul[0]), min(br[0], w)
            img_y = max(0, ul[1]), min(br[1], h)
            target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]

    if use_different_joints_weight and joints_weight is not None:
        target_weight = target_weight * joints_weight
    return target, target_weight


def _trunc_round(x):
    """Reference quantization: int(x + 0.5) with truncation toward zero."""
    return jnp.trunc(x + 0.5).astype(jnp.int32)


def generate_target_jax(joints, joints_vis, heatmap_size, image_size, sigma,
                        joints_weight=None, use_different_joints_weight=False):
    """Vectorized target generator for a batch of samples.

    joints: (..., J, 2) float; joints_vis: (..., J) float (visibility flag).
    heatmap_size / image_size: static (width, height) tuples.
    Returns (target (..., J, H, W) float32, target_weight (..., J) float32).

    Equivalence with the stamped-window reference: within the clipped window
    the stamped value is ``exp(-((px - mu_x)^2 + (py - mu_y)^2) / (2 sigma^2))``
    (the window Gaussian is centered at ``mu``), and zero outside — so a
    full-grid evaluation masked to ``|p - mu| <= 3 sigma`` is exact.
    """
    if float(sigma) != int(sigma):
        raise ValueError(
            "generate_target_jax supports integer MODEL.SIGMA only (the "
            "masked-window formulation is exact for integer sigma; all "
            "shipped configs use SIGMA=2). Use host targets "
            "(generate_target_np) for fractional sigma.")
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    sx = float(image_size[0]) / float(heatmap_size[0])
    sy = float(image_size[1]) / float(heatmap_size[1])
    tmp = int(sigma) * 3

    mu_x = _trunc_round(joints[..., 0] / sx)  # (..., J)
    mu_y = _trunc_round(joints[..., 1] / sy)

    in_bounds = ((mu_x - tmp < w) & (mu_y - tmp < h)
                 & (mu_x + tmp + 1 >= 0) & (mu_y + tmp + 1 >= 0))
    vis = (joints_vis > 0).astype(jnp.float32)
    weight = vis * in_bounds.astype(jnp.float32)

    px = jnp.arange(w, dtype=jnp.float32)          # (W,)
    py = jnp.arange(h, dtype=jnp.float32)          # (H,)
    dx = px - mu_x[..., None].astype(jnp.float32)  # (..., J, W)
    dy = py - mu_y[..., None].astype(jnp.float32)  # (..., J, H)
    gx = jnp.exp(-(dx ** 2) / (2.0 * sigma ** 2)) * (jnp.abs(dx) <= tmp)
    gy = jnp.exp(-(dy ** 2) / (2.0 * sigma ** 2)) * (jnp.abs(dy) <= tmp)
    # Separable outer product -> (..., J, H, W)
    target = gy[..., :, None] * gx[..., None, :]
    stamp = (vis * in_bounds.astype(jnp.float32) > 0.5).astype(jnp.float32)
    target = target * stamp[..., None, None]

    if use_different_joints_weight and joints_weight is not None:
        weight = weight * jnp.asarray(joints_weight, dtype=jnp.float32)
    return target.astype(jnp.float32), weight
