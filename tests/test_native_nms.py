"""Native C++ and on-device (JAX/Pallas) NMS: keep-list parity with the
reference-semantics numpy implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from fhpe_tpu.ops import native
from fhpe_tpu.ops.nms import nms, oks_iou, oks_nms, soft_oks_nms
from fhpe_tpu.ops.nms_jax import (box_nms_device, oks_nms_device,
                                  pairwise_oks_jnp, pairwise_oks_pallas)


def _random_kpts_db(rng, n=20, j=17):
    db = []
    for _ in range(n):
        base = rng.uniform(50, 400, size=(1, 2))
        kp = np.zeros((j, 3))
        kp[:, :2] = base + rng.normal(scale=rng.uniform(2, 60), size=(j, 2))
        kp[:, 2] = rng.uniform(0, 1, size=j)
        db.append({"keypoints": kp, "score": rng.uniform(0.1, 1.0),
                   "area": rng.uniform(1e3, 1e5)})
    return db


def _random_dets(rng, n=30):
    xy = rng.uniform(0, 400, size=(n, 2))
    wh = rng.uniform(20, 150, size=(n, 2))
    scores = rng.uniform(0, 1, size=(n, 1))
    return np.concatenate([xy, xy + wh, scores], axis=1)


@pytest.mark.skipif(not native.available(), reason="C++ lib not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cpp_box_nms_parity(seed):
    rng = np.random.RandomState(seed)
    dets = _random_dets(rng)
    for thresh in (0.3, 0.5, 0.7):
        assert native.box_nms_native(dets, thresh) == nms(dets, thresh)


@pytest.mark.skipif(not native.available(), reason="C++ lib not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cpp_oks_nms_parity(seed):
    rng = np.random.RandomState(seed)
    db = _random_kpts_db(rng)
    for thresh in (0.5, 0.9):
        assert native.oks_nms_native(db, thresh) == oks_nms(db, thresh)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_oks_nms_parity(seed):
    rng = np.random.RandomState(seed)
    db = _random_kpts_db(rng, n=25)
    for thresh in (0.5, 0.9):
        assert oks_nms_device(db, thresh) == oks_nms(db, thresh)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_box_nms_parity(seed):
    rng = np.random.RandomState(seed)
    dets = _random_dets(rng, n=40)
    for thresh in (0.3, 0.6):
        assert box_nms_device(dets, thresh) == nms(dets, thresh)


def test_pairwise_oks_matches_reference_formula():
    rng = np.random.RandomState(3)
    db = _random_kpts_db(rng, n=6)
    kpts = np.array([k["keypoints"].flatten() for k in db])
    areas = np.array([k["area"] for k in db])
    xs = jnp.asarray(kpts[:, 0::3])
    ys = jnp.asarray(kpts[:, 1::3])
    mat = np.asarray(pairwise_oks_jnp(xs, ys, jnp.asarray(areas)))
    for i in range(6):
        ref = oks_iou(kpts[i], np.delete(kpts, i, 0), areas[i],
                      np.delete(areas, i))
        np.testing.assert_allclose(np.delete(mat[i], i), ref, rtol=1e-5)


def test_pallas_oks_matches_jnp():
    rng = np.random.RandomState(4)
    n, j = 128, 17
    xs = jnp.asarray(rng.uniform(0, 400, size=(n, j)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(0, 400, size=(n, j)).astype(np.float32))
    areas = jnp.asarray(rng.uniform(1e3, 1e5, size=n).astype(np.float32))
    ref = np.asarray(pairwise_oks_jnp(xs, ys, areas))
    got = np.asarray(pairwise_oks_pallas(xs, ys, areas))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_device_oks_nms_pallas_path():
    rng = np.random.RandomState(5)
    db = _random_kpts_db(rng, n=10)
    assert oks_nms_device(db, 0.9, use_pallas=True) == oks_nms(db, 0.9)


def test_pallas_decode_matches_jax():
    from fhpe_tpu.ops.decode import get_max_preds_jax, quarter_offset_jax
    from fhpe_tpu.ops.decode_pallas import decode_pallas

    rng = np.random.RandomState(7)
    hm = rng.randn(6, 64, 48, 17).astype(np.float32)
    hm[0, :, :, 0] = 0.0                     # all-tie row -> first index
    hm[1, :, :, 1] = -np.abs(hm[1, :, :, 1])  # non-positive max -> masked
    hmj = jnp.asarray(hm)
    ref_c, ref_v = get_max_preds_jax(hmj)
    ref_c = quarter_offset_jax(ref_c, hmj)
    got_c, got_v = decode_pallas(hmj)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


@pytest.mark.skipif(not native.available(), reason="C++ lib not built")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cpp_soft_oks_nms_parity(seed):
    rng = np.random.RandomState(seed)
    db = _random_kpts_db(rng, n=30)
    for thresh in (0.5, 0.9):
        for md in (5, 20):
            got = native.soft_oks_nms_native(db, thresh, max_dets=md)
            ref = soft_oks_nms(db, thresh, max_dets=md)
            assert got == ref, (thresh, md)
