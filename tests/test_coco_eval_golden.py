"""Hand-constructed COCOeval golden fixtures with ANALYTIC expected values.

The fuzz test (test_coco_eval_fuzz.py) pins the production evaluator
against the pycocotools transcription oracle — but a shared misreading of
the published protocol would pass both.  These scenes have expected
AP/AR values derived BY HAND from the published COCOeval keypoint
protocol (OKS thresholds 0.50:0.05:0.95, greedy score-ordered matching,
crowd rematch, area ranges, maxDets=20, 101-point interpolated
precision), so BOTH implementations are checked against protocol truth,
breaking the transcription circularity (round-3 verdict, missing #3).

Scene catalogue (J=17 keypoints; 'perfect' det == gt keypoints):
  1 perfect match ............... AP = AR = 1 at every threshold/range
  2 high-scored FP + perfect TP .. AP = 0.5 (precision envelope is flat
                                   0.5), AR = 1
  3 maxDets truncation ........... the only true positive ranks 21st of
                                   21 -> dropped -> AP = AR = 0
  4 crowd rematch ................ a higher-scored det overlapping an
                                   already-"matched" crowd gt is ignored,
                                   not a false positive -> AP = 1
  5 area-range split ............. medium TP + large miss -> AP(M)=1,
                                   AP(L)=0, AP(all)=51/101 (precision 1
                                   up to recall 0.5, then 0)
"""

import numpy as np
import pytest

from fhpe_tpu.eval.coco_eval import STATS_NAMES, CocoKeypointEval
from fhpe_tpu.ops.nms import COCO_SIGMAS

from cocoeval_oracle import KeypointCocoevalOracle
from test_coco_eval_fuzz import FakeIndex

J = 17


def _gt(ann_id, cx, cy, side, iscrowd=0, num_keypoints=J):
    """A gt person: keypoints on a grid inside a side x side box."""
    kps = np.zeros(3 * J)
    for j in range(J):
        kps[3 * j + 0] = cx + (j % 4) * side / 4.0
        kps[3 * j + 1] = cy + (j // 4) * side / 4.0
        kps[3 * j + 2] = 2 if num_keypoints else 0
    return {"id": ann_id, "category_id": 1, "iscrowd": iscrowd,
            "num_keypoints": num_keypoints,
            "keypoints": kps.tolist(),
            "bbox": [cx, cy, side, side],
            "area": float(side * side)}


def _det(img_id, gt=None, score=0.9, offset=0.0, at=None):
    """A detection: on a gt (optionally offset), or at a raw location."""
    if gt is not None:
        kps = np.asarray(gt["keypoints"], dtype=np.float64).copy()
        kps[0::3] += offset
        kps[1::3] += offset
    else:
        cx, cy, side = at
        kps = np.zeros(3 * J)
        kps[0::3] = np.linspace(cx, cx + side, J)
        kps[1::3] = np.linspace(cy, cy + side, J)
    kps[2::3] = 1.0
    return {"image_id": img_id, "category_id": 1,
            "keypoints": kps.tolist(), "score": float(score)}


def _both(gt_by_img, img_ids, dets):
    prod = dict(CocoKeypointEval(FakeIndex(gt_by_img, img_ids)).evaluate(dets))
    orc = dict(zip(STATS_NAMES,
                   KeypointCocoevalOracle(gt_by_img, img_ids,
                                          COCO_SIGMAS).evaluate(dets)))
    return prod, orc


def _check(stats, expected, scene):
    for name, val in expected.items():
        assert np.isclose(stats[name], val, atol=1e-12), (
            f"{scene}: {name} = {stats[name]} expected {val}\n{stats}")


def test_scene1_perfect_match():
    g1, g2 = _gt(1, 50, 50, 50), _gt(2, 40, 40, 150)  # medium + large
    gt_by_img = {1: [g1], 2: [g2]}
    dets = [_det(1, g1), _det(2, g2, score=0.8)]
    expected = {"AP": 1.0, "Ap .5": 1.0, "AP .75": 1.0, "AP (M)": 1.0,
                "AP (L)": 1.0, "AR": 1.0, "AR .5": 1.0, "AR .75": 1.0,
                "AR (M)": 1.0, "AR (L)": 1.0}
    for stats in _both(gt_by_img, [1, 2], dets):
        _check(stats, expected, "perfect match")


def test_scene2_high_scored_fp():
    """FP outranks the TP: pr = [0, 1/2] -> envelope 0.5 everywhere."""
    g1 = _gt(1, 50, 50, 50)
    gt_by_img = {1: [g1]}
    dets = [_det(1, g1, score=0.6),
            _det(1, at=(900, 900, 40), score=0.95)]  # far off, higher score
    expected = {"AP": 0.5, "Ap .5": 0.5, "AP .75": 0.5, "AP (M)": 0.5,
                "AR": 1.0, "AR .5": 1.0, "AR (M)": 1.0,
                "AP (L)": -1.0, "AR (L)": -1.0}  # no large gt anywhere
    for stats in _both(gt_by_img, [1], dets):
        _check(stats, expected, "high-scored FP")


def test_scene3_maxdets_truncation():
    """The only correct det has the lowest score of 21 -> truncated out."""
    g1 = _gt(1, 50, 50, 50)
    gt_by_img = {1: [g1]}
    dets = [_det(1, at=(700 + 10 * i, 700, 40), score=0.9 - 0.01 * i)
            for i in range(20)]
    dets.append(_det(1, g1, score=0.05))  # rank 21 of 21
    expected = {"AP": 0.0, "Ap .5": 0.0, "AP (M)": 0.0,
                "AR": 0.0, "AR .5": 0.0, "AR (M)": 0.0}
    for stats in _both(gt_by_img, [1], dets):
        _check(stats, expected, "maxDets truncation")
    # control: without the 20 junk dets the same correct det scores 1.0
    for stats in _both(gt_by_img, [1], dets[-1:]):
        _check(stats, {"AP": 1.0, "AR": 1.0}, "maxDets control")


def test_scene4_crowd_rematch():
    """A det inside a crowd region is ignored even at a higher score;
    breaking crowd rematch would make it a FP and halve AP."""
    g1 = _gt(1, 50, 50, 50)
    crowd = _gt(2, 300, 300, 100, iscrowd=1, num_keypoints=0)
    gt_by_img = {1: [g1, crowd]}
    dets = [_det(1, g1, score=0.6),
            _det(1, at=(320, 320, 50), score=0.95)]  # inside crowd bbox
    expected = {"AP": 1.0, "Ap .5": 1.0, "AP (M)": 1.0,
                "AR": 1.0, "AR (M)": 1.0}
    for stats in _both(gt_by_img, [1], dets):
        _check(stats, expected, "crowd rematch")


def test_scene5_area_range_split():
    """Medium TP + large miss: AP(M)=1, AP(L)=0, AP(all)=51/101
    (npig=2, recall tops out at 0.5: precision 1 for the 51 recall
    thresholds 0.00..0.50, 0 above)."""
    g1 = _gt(1, 50, 50, 50)      # area 2500: medium
    g2 = _gt(2, 40, 40, 150)     # area 22500: large
    gt_by_img = {1: [g1], 2: [g2]}
    dets = [_det(1, g1, score=0.9),
            _det(2, at=(900, 900, 150), score=0.8)]  # large-extent miss
    ap_all = 51.0 / 101.0
    expected = {"AP": ap_all, "Ap .5": ap_all, "AP .75": ap_all,
                "AP (M)": 1.0, "AP (L)": 0.0,
                "AR": 0.5, "AR (M)": 1.0, "AR (L)": 0.0}
    for stats in _both(gt_by_img, [1, 2], dets):
        _check(stats, expected, "area-range split")
