"""Debug image dumps: annotated joints and heatmap grids.

Behavioral equivalent of the reference ``lib/utils/vis.py``: a grid image
of batch samples with joints drawn, and a per-joint JET-colormap heatmap
grid; gated by the DEBUG.* flags (vis.py:119-141).  Operates on NHWC
batches (uint8 images or normalized floats).
"""

from __future__ import annotations

import math

import numpy as np

from ..ops.decode import get_max_preds
from ..ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def _denormalize(images: np.ndarray) -> np.ndarray:
    """Accept uint8 or normalized float NHWC; return uint8 NHWC."""
    if images.dtype == np.uint8:
        return images
    img = (images * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def joints_grid(batch_image, batch_joints, batch_joints_vis,
                nrow=8, padding=2) -> np.ndarray:
    """Grid of images with green joint dots (vis.py:20-51); BGR HWC uint8."""
    import cv2

    images = _denormalize(np.asarray(batch_image))
    b, h, w, _ = images.shape
    nrow = min(nrow, b)
    ncol = int(math.ceil(b / nrow))
    grid = np.zeros((ncol * (h + padding), nrow * (w + padding), 3), np.uint8)
    k = 0
    for y in range(ncol):
        for x in range(nrow):
            if k >= b:
                break
            img = images[k].copy()
            for joint, vis in zip(batch_joints[k], batch_joints_vis[k]):
                if float(np.atleast_1d(vis)[0]) > 0:
                    cv2.circle(img, (int(joint[0]), int(joint[1])), 2,
                               [0, 255, 0], 2)
            ys, xs = y * (h + padding), x * (w + padding)
            grid[ys:ys + h, xs:xs + w] = img
            k += 1
    return grid


def save_batch_image_with_joints(batch_image, batch_joints, batch_joints_vis,
                                 file_name, nrow=8, padding=2):
    import cv2

    cv2.imwrite(file_name,
                joints_grid(batch_image, batch_joints, batch_joints_vis,
                            nrow, padding))


def heatmaps_grid(batch_image, batch_heatmaps) -> np.ndarray:
    """Per-sample row: resized image + per-joint JET heatmaps (vis.py:54-116);
    BGR HWC uint8."""
    import cv2

    images = _denormalize(np.asarray(batch_image))
    hm = np.asarray(batch_heatmaps)  # NHWC
    b, hh, hw, j = hm.shape
    grid = np.zeros((b * hh, (j + 1) * hw, 3), np.uint8)

    nchw = np.transpose(hm, (0, 3, 1, 2))
    preds, maxvals = get_max_preds(nchw)

    for i in range(b):
        img = cv2.resize(images[i], (hw, hh))
        heatmaps = np.clip(nchw[i] * 255, 0, 255).astype(np.uint8)
        row0 = i * hh
        grid[row0:row0 + hh, 0:hw] = img
        for ji in range(j):
            colored = cv2.applyColorMap(heatmaps[ji], cv2.COLORMAP_JET)
            masked = colored * 0.7 + img * 0.3
            cv2.circle(masked, (int(preds[i][ji][0]), int(preds[i][ji][1])),
                       1, [0, 0, 255], 1)
            xs = (ji + 1) * hw
            grid[row0:row0 + hh, xs:xs + hw] = masked
    return grid


def save_batch_heatmaps(batch_image, batch_heatmaps, file_name,
                        normalize=True):
    import cv2

    cv2.imwrite(file_name, heatmaps_grid(batch_image, batch_heatmaps))


def tb_log_images(writer, tag_prefix, cfg, batch_image, batch_joints,
                  batch_joints_vis, batch_target, batch_output, step):
    """TensorBoard image summaries of the debug grids (beyond the
    reference, which writes scalars only — function.py:88-91,304-330 —
    and dumps grids to disk; here the same DEBUG.*-gated grids also land
    in TB as HWC RGB images)."""
    if writer is None or not cfg.DEBUG.DEBUG:
        return
    try:
        if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
            g = joints_grid(batch_image, batch_joints, batch_joints_vis)
            writer.add_image(f"{tag_prefix}_gt", g[..., ::-1], step,
                             dataformats="HWC")
        if cfg.DEBUG.SAVE_HEATMAPS_PRED:
            g = heatmaps_grid(batch_image, batch_output)
            writer.add_image(f"{tag_prefix}_hm_pred", g[..., ::-1], step,
                             dataformats="HWC")
        if cfg.DEBUG.SAVE_HEATMAPS_GT:
            g = heatmaps_grid(batch_image, batch_target)
            writer.add_image(f"{tag_prefix}_hm_gt", g[..., ::-1], step,
                             dataformats="HWC")
    except Exception:  # TB image encoding must never kill a run
        pass


def save_debug_images(cfg, batch_image, batch_joints, batch_joints_vis,
                      batch_target, batch_output, prefix):
    """DEBUG.*-gated dumps (vis.py:119-141).  Heatmaps are NHWC."""
    if not cfg.DEBUG.DEBUG:
        return
    if cfg.DEBUG.SAVE_BATCH_IMAGES_GT:
        save_batch_image_with_joints(batch_image, batch_joints,
                                     batch_joints_vis, f"{prefix}_gt.jpg")
    if cfg.DEBUG.SAVE_BATCH_IMAGES_PRED:
        nchw = np.transpose(np.asarray(batch_output), (0, 3, 1, 2))
        preds, _ = get_max_preds(nchw)
        stride = np.asarray(batch_image).shape[1] / nchw.shape[2]
        save_batch_image_with_joints(
            batch_image, preds * stride,
            np.ones((preds.shape[0], preds.shape[1], 1)),
            f"{prefix}_pred.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_GT:
        save_batch_heatmaps(batch_image, batch_target, f"{prefix}_hm_gt.jpg")
    if cfg.DEBUG.SAVE_HEATMAPS_PRED:
        save_batch_heatmaps(batch_image, batch_output, f"{prefix}_hm_pred.jpg")
