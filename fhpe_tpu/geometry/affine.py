"""Affine-transform geometry for top-down pose cropping.

Reimplements (from behavior, not code) the crop geometry of the reference's
``lib/utils/transforms.py:49-110``: a person box given as (center, scale,
rotation) maps to a fixed-size network input via an affine transform built
from a 3-point correspondence.  The reference delegates the final solve to
``cv2.getAffineTransform``; here it is a closed-form 3x3 linear solve so the
function is dependency-free and batch/JIT-friendly.  Parity with cv2 is
pinned by tests (tests/test_geometry.py).

Conventions (identical to the reference):
* ``scale`` is in units of 200 px (``pixel_std``): box side = scale * 200.
* ``output_size`` is (width, height).
* rotation is in degrees, counter-clockwise about the box center.
"""

from __future__ import annotations

import numpy as np


def _rotate(point: np.ndarray, rad: float) -> np.ndarray:
    sn, cs = np.sin(rad), np.cos(rad)
    return np.array([point[0] * cs - point[1] * sn,
                     point[0] * sn + point[1] * cs], dtype=np.float64)


def _third_point(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Third corner completing a right triangle: b + perp(a - b).

    Arithmetic happens in the inputs' dtype (float32 in the transform
    construction) to mirror the reference's get_3rd_point exactly.
    """
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=d.dtype)


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 affine T with T @ [src_i, 1]^T = dst_i for three point pairs.

    Points are quantized to float32 first — exactly what
    cv2.getAffineTransform receives from the reference's float32 point
    arrays (transforms.py:85-87).  When cv2 is importable its solver is
    used so downstream cv2.warpAffine fixed-point sampling is BIT-identical
    to the reference pipeline (LU pivoting order differs from numpy's at
    the ~1e-13 level, which can flip isolated pixels at exact-half sample
    boundaries); the closed-form float64 solve is the dependency-free
    fallback.
    """
    src32 = src.astype(np.float32)
    dst32 = dst.astype(np.float32)
    try:
        import cv2
        return np.asarray(cv2.getAffineTransform(src32, dst32),
                          dtype=np.float64)
    except ImportError:
        a = np.concatenate([src32.astype(np.float64), np.ones((3, 1))],
                           axis=1)  # (3, 3)
        return np.linalg.solve(a, dst32.astype(np.float64)).T


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0), inv=False):
    """Affine matrix mapping the (center, scale, rot) person box to output pixels.

    Matches the reference construction (``lib/utils/transforms.py:57-89``):
    correspondence points are the box center, a point half a box-width above
    it (rotated by ``rot``), and the perpendicular third point; the source
    box width is ``scale[0] * 200``.  ``inv=True`` returns the output->source
    transform (used to map predictions back to original image coordinates).
    """
    # Dtype flow mirrors the reference's numpy promotion exactly
    # (transforms.py:57-73): COCO db records store center/scale as float32
    # (lib/dataset/coco.py _xywh2cs), so `scale * 200.0` there rounds the
    # box width to float32 BEFORE the point construction; forcing float64
    # here instead shifts the affine matrix by ~1e-8, which flips isolated
    # warped pixels at exact bilinear ties.  MPII records are float64 and
    # stay float64.  Integer/list inputs promote to float64 as in numpy.
    center = np.asarray(center)
    scale = np.asarray(scale)
    if not np.issubdtype(scale.dtype, np.floating):
        scale = scale.astype(np.float64)
    if not np.issubdtype(center.dtype, np.floating):
        center = center.astype(np.float64)
    if scale.ndim == 0:
        scale = np.array([scale, scale], dtype=scale.dtype)
    # reference default shift is float32 zeros; scale_tmp * shift happens
    # in the promoted dtype there too
    shift = np.asarray(shift, dtype=np.float32)

    box = scale * 200.0
    src_w = box[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    # src_w * -0.5 rounds in src_w's own dtype (the reference builds the
    # point list from the float32 scalar); the rotation itself runs in
    # float64 like the reference's get_dir (sin/cos are float64)
    src_dir = _rotate(np.array([0.0, src_w * np.asarray(-0.5, src_w.dtype)],
                               dtype=np.float64), rot_rad)
    dst_dir = np.array([0.0, dst_w * -0.5])

    # Precision flow matches the reference exactly (transforms.py:74-82):
    # rows 0/1 are float64 expressions stored into float32 arrays, and the
    # third point is derived FROM the stored float32 values in float32
    # arithmetic — this matters for bit-identical cv2.warpAffine sampling.
    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0] = center + box * shift
    src[1] = center + src_dir + box * shift
    src[2] = _third_point(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    dst[2] = _third_point(dst[0], dst[1])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform(pt, t) -> np.ndarray:
    """Apply a 2x3 affine to a single (x, y) point (transforms.py:92-95)."""
    p = np.array([pt[0], pt[1], 1.0])
    return (t @ p)[:2]


def transform_preds(coords, center, scale, output_size) -> np.ndarray:
    """Map heatmap-space keypoints back to source-image coordinates.

    Vectorized equivalent of the reference's per-point loop
    (``lib/utils/transforms.py:49-54``).
    coords: (num_joints, 2+) array; only [:, :2] is transformed.
    """
    coords = np.asarray(coords)
    t = get_affine_transform(center, scale, 0, output_size, inv=True)
    ones = np.ones((coords.shape[0], 1))
    homo = np.concatenate([coords[:, :2], ones], axis=1)  # (J, 3)
    out = np.zeros(coords.shape)
    out[:, :2] = homo @ t.T
    return out


def crop(img, center, scale, output_size, rot=0) -> np.ndarray:
    """Crop a (center, scale, rot) person box to ``output_size`` pixels.

    Standalone equivalent of the reference's ``crop()`` helper
    (``lib/utils/transforms.py:113-121``): build the box->output affine and
    bilinear-warp the image (cv2 INTER_LINEAR semantics, constant-0
    border).  Prefers cv2; uint8 images fall back to the bit-parity native
    warp (``ops/cpp/imagedec.cpp``) when cv2 is unavailable.
    """
    trans = get_affine_transform(center, scale, rot, output_size)
    dsize = (int(output_size[0]), int(output_size[1]))
    try:
        import cv2
        return cv2.warpAffine(img, trans, dsize, flags=cv2.INTER_LINEAR)
    except ImportError:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            # silently casting floats here would truncate [0,1]-scaled
            # images to all zeros; the native warp is uint8-only by design
            raise ValueError(
                f"crop() without cv2 supports uint8 images only, got "
                f"dtype {img.dtype}")
        from ..ops.native_image import warp_affine_native
        return warp_affine_native(np.ascontiguousarray(img), trans, dsize)


def transform_preds_batch(coords, centers, scales, output_size) -> np.ndarray:
    """Batched transform_preds: coords (N, J, 2), centers/scales (N, 2)."""
    coords = np.asarray(coords, dtype=np.float64)
    n, j, _ = coords.shape
    out = np.zeros_like(coords)
    for i in range(n):
        t = get_affine_transform(centers[i], scales[i], 0, output_size, inv=True)
        homo = np.concatenate([coords[i], np.ones((j, 1))], axis=1)
        out[i] = homo @ t.T
    return out
