"""Heatmap -> keypoint decoding.

Behavioral equivalent of the reference ``lib/core/inference.py``: flattened
argmax (first-max tie-break), zeroing where the max is non-positive, the
quarter-pixel offset toward the larger neighbor (TEST.POST_PROCESS), and the
inverse-affine map back to source-image coordinates.

Two paths:
* numpy (`get_max_preds` / `get_final_preds`) — the parity oracle, NCHW like
  the reference.
* JAX (`get_max_preds_jax` / `decode_heatmaps_jax`) — fully on-device NHWC,
  vectorized over batch and joints; used inside the jitted eval step so only
  (x, y, conf) per joint crosses back to the host (the reference copies the
  full heatmap tensor to the CPU every eval batch, function.py:250,264).

Tie-break parity: ``jnp.argmax`` and ``np.argmax`` both return the first
maximal index, so decode results are bit-identical.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.affine import get_affine_transform, transform_preds


# ----------------------------------------------------------------------------
# numpy oracle (NCHW)
# ----------------------------------------------------------------------------

def get_max_preds(batch_heatmaps: np.ndarray):
    """(B, J, H, W) -> preds (B, J, 2) in (x, y), maxvals (B, J, 1)."""
    assert batch_heatmaps.ndim == 4
    b, j, _, w = batch_heatmaps.shape
    flat = batch_heatmaps.reshape((b, j, -1))
    idx = np.argmax(flat, 2).reshape((b, j, 1))
    maxvals = np.amax(flat, 2).reshape((b, j, 1))

    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = preds[:, :, 0] % w
    preds[:, :, 1] = np.floor(preds[:, :, 1] / w)
    preds *= np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    return preds, maxvals


def post_process_quarter_offset(coords: np.ndarray, batch_heatmaps: np.ndarray):
    """+-0.25 px shift toward the larger neighbor (inference.py:56-69)."""
    h, w = batch_heatmaps.shape[2:4]
    coords = coords.copy()
    for n in range(coords.shape[0]):
        for p in range(coords.shape[1]):
            hm = batch_heatmaps[n][p]
            px = int(math.floor(coords[n][p][0] + 0.5))
            py = int(math.floor(coords[n][p][1] + 0.5))
            if 1 < px < w - 1 and 1 < py < h - 1:
                diff = np.array([hm[py][px + 1] - hm[py][px - 1],
                                 hm[py + 1][px] - hm[py - 1][px]])
                coords[n][p] += np.sign(diff) * 0.25
    return coords


def get_final_preds(batch_heatmaps, centers, scales, post_process=True):
    """Full decode: argmax [-> quarter offset] -> inverse affine.

    Mirrors ``get_final_preds`` (inference.py:49-79).
    """
    coords, maxvals = get_max_preds(batch_heatmaps)
    h, w = batch_heatmaps.shape[2:4]
    if post_process:
        coords = post_process_quarter_offset(coords, batch_heatmaps)
    preds = coords.copy()
    for i in range(coords.shape[0]):
        preds[i] = transform_preds(coords[i], centers[i], scales[i], [w, h])
    return preds, maxvals


# ----------------------------------------------------------------------------
# JAX on-device path (NHWC)
# ----------------------------------------------------------------------------

def get_max_preds_jax(heatmaps: jnp.ndarray):
    """(B, H, W, J) -> coords (B, J, 2) float32 (x, y), maxvals (B, J)."""
    b, h, w, j = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (maxvals > 0.0)[..., None].astype(jnp.float32)
    return coords, maxvals


def _gather_hm(heatmaps, py, px):
    """heatmaps (B, H, W, J); py/px (B, J) int -> values (B, J)."""
    b, h, w, j = heatmaps.shape
    bi = jnp.arange(b)[:, None]
    ji = jnp.arange(j)[None, :]
    return heatmaps[bi, py, px, ji]


def quarter_offset_jax(coords, heatmaps):
    """Vectorized quarter-pixel offset; parity with the numpy loop."""
    b, h, w, j = heatmaps.shape
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    ok = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)
    dx = _gather_hm(heatmaps, pyc, pxc + 1) - _gather_hm(heatmaps, pyc, pxc - 1)
    dy = _gather_hm(heatmaps, pyc + 1, pxc) - _gather_hm(heatmaps, pyc - 1, pxc)
    delta = jnp.stack([jnp.sign(dx), jnp.sign(dy)], axis=-1) * 0.25
    return coords + delta * ok[..., None].astype(coords.dtype)


def decode_heatmaps_jax(heatmaps, inv_trans=None, post_process=True):
    """On-device decode.

    heatmaps: (B, H, W, J) NHWC.
    inv_trans: (B, 2, 3) inverse affine matrices (heatmap -> source image),
      built host-side with ``get_affine_transform(..., inv=True)``; None
      keeps heatmap coordinates.
    Returns (preds (B, J, 2), maxvals (B, J)).
    """
    coords, maxvals = get_max_preds_jax(heatmaps)
    if post_process:
        coords = quarter_offset_jax(coords, heatmaps)
    if inv_trans is not None:
        homo = jnp.concatenate(
            [coords, jnp.ones(coords.shape[:-1] + (1,), coords.dtype)], axis=-1)
        # precision=HIGHEST: TPU default matmul precision is bfloat16-pass,
        # which loses ~0.2% on pixel coordinates; this op is negligible work.
        coords = jnp.einsum("bij,bkj->bki", inv_trans.astype(coords.dtype),
                            homo, precision=jax.lax.Precision.HIGHEST)
    return coords, maxvals


def make_inverse_transforms(centers, scales, heatmap_size) -> np.ndarray:
    """(N, 2, 3) inverse affines for a batch (host-side, feeds the device)."""
    n = len(centers)
    out = np.zeros((n, 2, 3), dtype=np.float32)
    for i in range(n):
        out[i] = get_affine_transform(centers[i], scales[i], 0, heatmap_size,
                                      inv=True)
    return out
