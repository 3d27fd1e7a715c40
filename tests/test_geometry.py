"""Geometry parity tests.

The affine solve is checked against cv2.getAffineTransform (the routine the
reference delegates to, lib/utils/transforms.py:85-87), and the Gaussian
target generator's JAX version is checked elementwise against the scalar
numpy oracle, which itself mirrors JointsDataset.generate_target.
"""

import numpy as np
import pytest

from fhpe_tpu.geometry import (
    affine_transform,
    flip_back,
    flip_back_jax,
    flip_pair_permutation,
    fliplr_joints,
    generate_target_jax,
    generate_target_np,
    get_affine_transform,
    transform_preds,
)

cv2 = pytest.importorskip("cv2")

MPII_FLIP_PAIRS = [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]]


def _cv2_reference_transform(center, scale, rot, output_size, inv=0):
    """The reference's construction, using cv2 for the solve."""
    center = np.asarray(center, dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_point = [0, src_w * -0.5]
    src_dir = np.array([src_point[0] * cs - src_point[1] * sn,
                        src_point[0] * sn + src_point[1] * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center
    src[1, :] = center + src_dir
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = third(src[0, :], src[1, :])
    dst[2:, :] = third(dst[0, :], dst[1, :])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0.0, 30.0, -45.0, 13.7])
@pytest.mark.parametrize("inv", [0, 1])
def test_affine_matches_cv2(rot, inv):
    rng = np.random.RandomState(0)
    for _ in range(20):
        center = rng.uniform(50, 500, size=2)
        scale = rng.uniform(0.5, 3.0, size=2)
        out_size = (256, 256) if rng.rand() < 0.5 else (192, 256)
        ours = get_affine_transform(center, scale, rot, out_size, inv=bool(inv))
        ref = _cv2_reference_transform(center, scale, rot, out_size, inv=inv)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_affine_transform_point():
    t = get_affine_transform([100, 100], [1.0, 1.0], 0, (256, 256))
    # Box center must map to output center.
    np.testing.assert_allclose(affine_transform([100, 100], t), [128, 128],
                               atol=1e-6)


def test_transform_preds_roundtrip():
    center, scale = np.array([300.0, 250.0]), np.array([1.5, 1.5])
    out_size = (64, 64)
    fwd = get_affine_transform(center, scale, 0, out_size)
    pts_src = np.random.RandomState(1).uniform(100, 400, size=(16, 2))
    pts_hm = np.stack([affine_transform(p, fwd) for p in pts_src])
    back = transform_preds(pts_hm, center, scale, out_size)
    np.testing.assert_allclose(back[:, :2], pts_src, atol=1e-5)


def test_fliplr_joints():
    rng = np.random.RandomState(2)
    joints = rng.uniform(0, 100, size=(16, 3))
    joints[:, 2] = 0
    vis = (rng.rand(16, 1) > 0.3).astype(np.float64) * np.ones((16, 3))
    fj, fv = fliplr_joints(joints, vis, width=321, matched_parts=MPII_FLIP_PAIRS)
    # Pair 0<->5 swapped, x mirrored, masked by visibility.
    expected_x = (321 - joints[5, 0] - 1) * vis[5, 0]
    np.testing.assert_allclose(fj[0, 0], expected_x)
    np.testing.assert_allclose(fv[0], vis[5])


def test_flip_back_variants_agree():
    rng = np.random.RandomState(3)
    hm = rng.rand(2, 16, 64, 48).astype(np.float32)
    ref = flip_back(hm, MPII_FLIP_PAIRS)
    perm = flip_pair_permutation(16, MPII_FLIP_PAIRS)
    nhwc = np.transpose(hm, (0, 2, 3, 1))
    ours = np.asarray(flip_back_jax(nhwc, perm))
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-7)


@pytest.mark.parametrize("hm_size,img_size", [((64, 64), (256, 256)),
                                              ((48, 64), (192, 256))])
def test_generate_target_jax_matches_np(hm_size, img_size):
    rng = np.random.RandomState(4)
    for _ in range(10):
        joints = np.zeros((16, 3))
        # Include in-bounds, near-boundary, and far out-of-bounds joints.
        joints[:, 0] = rng.uniform(-80, img_size[0] + 80, size=16)
        joints[:, 1] = rng.uniform(-80, img_size[1] + 80, size=16)
        vis = np.zeros((16, 3))
        vis[:, 0] = (rng.rand(16) > 0.2).astype(np.float64)

        t_np, w_np = generate_target_np(joints, vis, hm_size, img_size, sigma=2)
        t_j, w_j = generate_target_jax(joints[:, :2], vis[:, 0], hm_size,
                                       img_size, sigma=2)
        np.testing.assert_allclose(np.asarray(t_j), t_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j), w_np[:, 0], atol=1e-7)


def test_generate_target_batched():
    rng = np.random.RandomState(5)
    joints = rng.uniform(0, 256, size=(3, 16, 2))
    vis = np.ones((3, 16))
    t, w = generate_target_jax(joints, vis, (64, 64), (256, 256), sigma=2)
    assert t.shape == (3, 16, 64, 64)
    assert w.shape == (3, 16)
    # Peak is 1 at the quantized joint location.
    assert float(np.asarray(t).max()) == pytest.approx(1.0)


def test_generate_target_weight_boundary():
    # Joint just outside: quantized center more than 3*sigma outside -> weight 0.
    joints = np.array([[-40.0, 32.0, 0.0]])  # mu_x = -10 <= -(6+1)
    vis = np.ones((1, 3))
    t, w = generate_target_np(joints, vis, (64, 64), (256, 256), sigma=2)
    tj, wj = generate_target_jax(joints[:, :2], vis[:, 0], (64, 64), (256, 256), 2)
    assert w[0, 0] == 0.0
    assert float(wj[0]) == 0.0
    assert t.sum() == 0.0 and float(np.asarray(tj).sum()) == 0.0


def test_crop_matches_reference_helper():
    """geometry.crop == the reference's standalone crop()
    (lib/utils/transforms.py:113-121): same transform, same warp flags."""
    from fhpe_tpu.geometry import crop

    import reference_oracle
    reference_oracle.install()
    from utils.transforms import crop as ref_crop

    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (320, 280, 3), dtype=np.uint8)
    for rot in (0, 30, -45):
        center = np.array([140.0 + rng.randn(), 160.0 + rng.randn()])
        scale = np.array([1.1, 1.1])
        ours = crop(img, center, scale, (192, 256), rot=rot)
        ref = ref_crop(img, center, scale, np.array([192, 256]), rot=rot)
        assert ours.shape == ref.shape == (256, 192, 3)
        np.testing.assert_array_equal(ours, ref)
