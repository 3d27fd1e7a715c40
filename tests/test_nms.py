"""NMS family tests: vectorized implementations vs slow per-pair oracles
written from the reference formulas (nms.py:35-177)."""

import numpy as np
import pytest

from fhpe_tpu.ops.nms import (COCO_SIGMAS, nms, oks_iou, oks_nms,
                              soft_oks_nms)


def _slow_oks_iou(g, d, a_g, a_d, sigmas=None):
    """Per-detection loop oracle (reference formula, nms.py:75-94)."""
    sigmas = COCO_SIGMAS if sigmas is None else sigmas
    variances = (sigmas * 2) ** 2
    xg, yg = g[0::3], g[1::3]
    out = np.zeros(len(d))
    for n in range(len(d)):
        xd, yd = d[n, 0::3], d[n, 1::3]
        e = ((xd - xg) ** 2 + (yd - yg) ** 2) / variances \
            / ((a_g + a_d[n]) / 2 + np.spacing(1)) / 2
        out[n] = np.sum(np.exp(-e)) / e.shape[0]
    return out


def _random_kpts_db(rng, n=12, j=17):
    db = []
    for _ in range(n):
        base = rng.uniform(50, 400, size=(1, 2))
        kp = np.zeros((j, 3))
        kp[:, :2] = base + rng.normal(scale=rng.uniform(2, 60), size=(j, 2))
        kp[:, 2] = rng.uniform(0, 1, size=j)
        db.append({"keypoints": kp, "score": rng.uniform(0.1, 1.0),
                   "area": rng.uniform(1e3, 1e5)})
    return db


def test_oks_iou_matches_oracle():
    rng = np.random.RandomState(0)
    db = _random_kpts_db(rng, n=8)
    kpts = np.array([k["keypoints"].flatten() for k in db])
    areas = np.array([k["area"] for k in db])
    ref = _slow_oks_iou(kpts[0], kpts[1:], areas[0], areas[1:])
    ours = oks_iou(kpts[0], kpts[1:], areas[0], areas[1:])
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_oks_nms_identical_dets_suppressed():
    rng = np.random.RandomState(1)
    kp = np.zeros((17, 3))
    kp[:, :2] = rng.uniform(100, 200, size=(17, 2))
    db = [{"keypoints": kp.copy(), "score": 0.9, "area": 1e4},
          {"keypoints": kp.copy(), "score": 0.8, "area": 1e4},  # duplicate
          {"keypoints": kp + 500, "score": 0.7, "area": 1e4}]   # far away
    keep = oks_nms(db, thresh=0.9)
    assert keep == [0, 2]


def test_oks_nms_empty():
    assert oks_nms([], 0.9) == []
    assert soft_oks_nms([], 0.9) == []


def test_oks_nms_greedy_order():
    rng = np.random.RandomState(2)
    db = _random_kpts_db(rng, n=15)
    keep = oks_nms(db, thresh=0.9)
    scores = [db[i]["score"] for i in keep]
    assert keep[0] == int(np.argmax([d["score"] for d in db]))
    assert len(set(keep)) == len(keep)
    # slow reference greedy for exact keep-list parity
    kpts = np.array([k["keypoints"].flatten() for k in db])
    areas = np.array([k["area"] for k in db])
    order = np.array([d["score"] for d in db]).argsort()[::-1]
    ref_keep = []
    while order.size > 0:
        i = order[0]
        ref_keep.append(int(i))
        ovr = _slow_oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]])
        order = order[1:][ovr <= 0.9]
    assert keep == ref_keep


def test_box_nms():
    dets = np.array([
        [0, 0, 100, 100, 0.9],
        [5, 5, 105, 105, 0.8],    # heavy overlap with first
        [200, 200, 300, 300, 0.7],
        [0, 0, 100, 100, 0.95],
    ])
    keep = nms(dets, 0.5)
    assert keep == [3, 2]


def test_soft_oks_nms_returns_capped():
    rng = np.random.RandomState(3)
    db = _random_kpts_db(rng, n=30)
    keep = soft_oks_nms(db, thresh=0.9, max_dets=20)
    assert len(keep) <= 20
    assert keep[0] == int(np.argmax([d["score"] for d in db]))
