"""Fused on-device preprocessing ops.

The reference does all per-sample preprocessing on the host in DataLoader
worker processes — cv2.warpAffine crop, ToTensor + Normalize, and Gaussian
target stamping (``JointsDataset.__getitem__``, JointsDataset.py:113-198).
Here the bandwidth-heavy parts run on device as fused XLA ops inside the
jitted step:

* :func:`normalize_images_jax` — uint8 -> float normalize with the
  torchvision constants (ToTensor /255 then Normalize mean/std,
  tools/train.py:150-152).  Fuses into the first convolution.
* :func:`warp_affine_jax` — batched bilinear affine warp equivalent to
  ``cv2.warpAffine(..., INTER_LINEAR)`` (constant-0 border): output pixel
  (x, y) samples the source at ``inv_trans @ (x, y, 1)``.  One gather per
  output pixel; vectorized over batch/height/width/channels.
* target generation lives in ``geometry/targets.generate_target_jax`` and
  is fused into the train step when ``TPU.DEVICE_PREPROCESS`` is on.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_images_jax(images, dtype=jnp.float32):
    """uint8/float (B, H, W, 3) -> normalized float NHWC.

    Matches ToTensor (/255) + Normalize(mean, std).  Accepts uint8 (the
    H2D-cheap layout: 4x less PCIe/DMA traffic than float32) or float in
    [0, 255].
    """
    x = images.astype(jnp.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(dtype)


def invert_affine_np(t: np.ndarray) -> np.ndarray:
    """Invert a (... , 2, 3) affine matrix (host-side, float64)."""
    t = np.asarray(t, dtype=np.float64)
    lin = t[..., :, :2]
    off = t[..., :, 2]
    inv_lin = np.linalg.inv(lin)
    inv_off = -np.einsum("...ij,...j->...i", inv_lin, off)
    return np.concatenate([inv_lin, inv_off[..., None]], axis=-1)


def warp_affine_jax(images, trans, out_size, dtype=jnp.float32):
    """Batched affine warp with bilinear sampling, cv2.warpAffine parity.

    images: (B, H, W, C) uint8 or float.
    trans: (B, 2, 3) **forward** src->dst matrices (what the reference
      passes to cv2.warpAffine); inversion happens here mathematically by
      passing the already-inverted matrix computed host-side — pass
      ``inv_trans`` = dst->src matrices.
    out_size: static (width, height).
    Border: constant 0 (cv2 default).
    """
    ow, oh = int(out_size[0]), int(out_size[1])
    b, h, w, c = images.shape
    img = images.astype(jnp.float32)

    # destination pixel grid
    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (oh, ow)

    # source coords: (B, oh, ow)
    t = trans.astype(jnp.float32)
    sx = t[:, 0, 0, None, None] * gx + t[:, 0, 1, None, None] * gy + t[:, 0, 2, None, None]
    sy = t[:, 1, 0, None, None] * gx + t[:, 1, 1, None, None] * gy + t[:, 1, 2, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        bi = jnp.arange(b, dtype=jnp.int32)[:, None, None]
        vals = img[bi, yi_c, xi_c]  # (B, oh, ow, C)
        return vals * inb[..., None].astype(jnp.float32)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out.astype(dtype)
