"""Fuzz the production COCO keypoint evaluator against the pycocotools
transcription oracle (tests/cocoeval_oracle.py).

Hundreds of randomized scenarios covering: empty images, detection-only and
gt-only images, crowd gts (rematchable), num_keypoints==0 ignores, partial
visibility, areas straddling the medium/large boundaries, score ties
(mergesort stability), >maxDets detections, and near-gt vs random
detections.  The production stats vector must match the oracle exactly
(float64 both sides).

Scenario count: 200 by default; set FHPE_FUZZ_N for more (the round-1
status claim was 500 — reproducible here with FHPE_FUZZ_N=500).
"""

import os

import numpy as np
import pytest

from fhpe_tpu.eval.coco_eval import STATS_NAMES, CocoKeypointEval
from fhpe_tpu.ops.nms import COCO_SIGMAS

from tests.cocoeval_oracle import KeypointCocoevalOracle

J = 17
FUZZ_N = int(os.environ.get("FHPE_FUZZ_N", "200"))


class FakeIndex:
    """Duck-typed CocoIndex over in-memory annotations."""

    def __init__(self, gt_by_img, img_ids):
        self.img_ids = list(img_ids)
        self.person_cat_id = 1
        self._by_img = gt_by_img

    def annotations(self, img_id, iscrowd=None):
        anns = self._by_img.get(img_id, [])
        if iscrowd is None:
            return anns
        return [a for a in anns if bool(a.get("iscrowd", 0)) == iscrowd]


def _rand_gt(rng, ann_id):
    """A gt annotation with area spanning the medium/large boundaries."""
    cx, cy = rng.uniform(30, 400, size=2)
    # side 20..150 -> area 400..22500 straddles 1024 (32^2) and 9216 (96^2)
    side = rng.uniform(20, 150)
    kps = np.zeros(3 * J)
    vis = rng.choice([0, 1, 2], size=J, p=[0.25, 0.35, 0.4])
    if rng.rand() < 0.1:
        vis[:] = 0  # num_keypoints == 0 -> ignored gt
    kps[0::3] = cx + rng.uniform(-side / 2, side / 2, size=J)
    kps[1::3] = cy + rng.uniform(-side / 2, side / 2, size=J)
    kps[2::3] = vis
    kps[0::3][vis == 0] = 0
    kps[1::3][vis == 0] = 0
    return {
        "id": ann_id,
        "category_id": 1,
        "keypoints": kps.tolist(),
        "num_keypoints": int(np.count_nonzero(vis)),
        "bbox": [cx - side / 2, cy - side / 2, side, side],
        "area": float(side * side * rng.uniform(0.5, 1.5)),
        "iscrowd": int(rng.rand() < 0.15),
    }


def _rand_dt(rng, img_id, gts, score_pool):
    """A detection: near a random gt (jittered) or fully random."""
    kps = np.zeros(3 * J)
    if gts and rng.rand() < 0.7:
        g = np.asarray(gts[rng.randint(len(gts))]["keypoints"])
        noise = rng.uniform(1, 30)
        kps[0::3] = g[0::3] + rng.normal(0, noise, size=J)
        kps[1::3] = g[1::3] + rng.normal(0, noise, size=J)
    else:
        kps[0::3] = rng.uniform(0, 450, size=J)
        kps[1::3] = rng.uniform(0, 450, size=J)
    kps[2::3] = rng.uniform(0.1, 1.0, size=J)
    # draw from a small score pool ~30% of the time to create exact ties
    score = (float(rng.choice(score_pool)) if rng.rand() < 0.3
             else float(rng.uniform(0, 1)))
    return {"image_id": img_id, "category_id": 1,
            "keypoints": kps.tolist(), "score": score}


def _scenario(rng):
    n_imgs = rng.randint(1, 6)
    img_ids = list(range(1, n_imgs + 1))
    gt_by_img = {}
    dets = []
    ann_id = 1
    score_pool = rng.uniform(0, 1, size=3)
    for img_id in img_ids:
        kind = rng.rand()
        n_gt = 0 if kind < 0.12 else rng.randint(0, 5)
        gts = []
        for _ in range(n_gt):
            gts.append(_rand_gt(rng, ann_id))
            ann_id += 1
        gt_by_img[img_id] = gts
        n_dt = 0 if 0.12 <= kind < 0.2 else rng.randint(0, 8)
        if rng.rand() < 0.05:
            n_dt = 25  # exceed maxDets=20
        for _ in range(n_dt):
            dets.append(_rand_dt(rng, img_id, gts, score_pool))
    return gt_by_img, img_ids, dets


def test_fuzz_against_pycocotools_transcription():
    rng = np.random.RandomState(20240816)
    n_nontrivial = 0
    for case in range(FUZZ_N):
        gt_by_img, img_ids, dets = _scenario(rng)

        prod = CocoKeypointEval(FakeIndex(gt_by_img, img_ids))
        prod_stats = dict(prod.evaluate(dets))

        oracle = KeypointCocoevalOracle(gt_by_img, img_ids, COCO_SIGMAS)
        orc_stats = oracle.evaluate(dets)

        for name, expected in zip(STATS_NAMES, orc_stats):
            np.testing.assert_allclose(
                prod_stats[name], expected, rtol=0, atol=1e-12,
                err_msg=f"case {case}: {name} "
                        f"(gt={sum(map(len, gt_by_img.values()))}, "
                        f"dt={len(dets)})")
        if orc_stats[0] > 0:
            n_nontrivial += 1
    # the generator must actually produce scoring scenarios, not just
    # degenerate -1/0 cases
    assert n_nontrivial > FUZZ_N // 4, n_nontrivial


def test_oracle_sanity_perfect_detection():
    """The oracle itself scores a perfect single detection as AP=AR=1."""
    rng = np.random.RandomState(5)
    gt = _rand_gt(rng, 1)
    gt["iscrowd"] = 0
    vis = np.asarray(gt["keypoints"][2::3])
    if not vis.any():
        gt["keypoints"][2::3] = [2] * J
        gt["num_keypoints"] = J
    det = {"image_id": 1, "category_id": 1,
           "keypoints": list(gt["keypoints"]), "score": 0.9}
    oracle = KeypointCocoevalOracle({1: [gt]}, [1], COCO_SIGMAS)
    stats = oracle.evaluate([det])
    np.testing.assert_allclose(stats[0], 1.0, rtol=1e-12)  # eps from
    np.testing.assert_allclose(stats[5], 1.0, rtol=1e-12)  # np.spacing(1)
