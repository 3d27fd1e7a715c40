"""COCO keypoint evaluator tests (protocol self-consistency).

pycocotools is unavailable here, so correctness is pinned with analytic
cases: perfect detections -> AP=1, misses -> AP=0, score ordering and
ignore handling behave per the COCOeval keypoint protocol.
"""

import numpy as np
import pytest

from fhpe_tpu.data.coco import CocoIndex
from fhpe_tpu.eval.coco_eval import CocoKeypointEval, compute_oks


def _fake_coco(tmp_path, n_images=4, people_per_img=2, seed=0):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i in range(1, n_images + 1):
        images.append({"id": i, "width": 640, "height": 480,
                       "file_name": f"{i:012d}.jpg"})
        for _ in range(people_per_img):
            x, y = rng.uniform(50, 400), rng.uniform(50, 300)
            w, h = rng.uniform(80, 150), rng.uniform(120, 180)
            kp = []
            for j in range(17):
                kp += [float(x + rng.uniform(0, w)),
                       float(y + rng.uniform(0, h)), 2]
            anns.append({
                "id": aid, "image_id": i, "category_id": 1,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                "keypoints": kp, "num_keypoints": 17,
            })
            aid += 1
    import json
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person"}]}))
    return str(p), anns


def _det_from_ann(ann, score=0.9, jitter=0.0, rng=None):
    kp = np.array(ann["keypoints"], dtype=np.float64).reshape(17, 3)
    if jitter and rng is not None:
        kp[:, :2] += rng.normal(scale=jitter, size=(17, 2))
    kp[:, 2] = score
    return {"image_id": ann["image_id"], "category_id": 1,
            "keypoints": kp.flatten().tolist(), "score": score}


def test_perfect_detections_ap1(tmp_path):
    ann_file, anns = _fake_coco(tmp_path)
    ev = CocoKeypointEval(CocoIndex(ann_file))
    dets = [_det_from_ann(a) for a in anns]
    stats = dict(ev.evaluate(dets))
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)
    assert stats["Ap .5"] == pytest.approx(1.0)


def test_no_detections(tmp_path):
    """Empty detections with gts present -> AP/AR exactly 0 (pinned
    convention; -1 is reserved for 'no evaluable gts')."""
    ann_file, _ = _fake_coco(tmp_path)
    ev = CocoKeypointEval(CocoIndex(ann_file))
    stats = dict(ev.evaluate([]))
    assert stats["AP"] == 0.0
    assert stats["AR"] == 0.0


def test_jittered_detections_between(tmp_path):
    ann_file, anns = _fake_coco(tmp_path)
    rng = np.random.RandomState(1)
    ev = CocoKeypointEval(CocoIndex(ann_file))
    dets = [_det_from_ann(a, jitter=18.0, rng=rng) for a in anns]
    ap = dict(ev.evaluate(dets))["AP"]
    assert 0.0 < ap < 1.0


def test_missing_half_detections(tmp_path):
    ann_file, anns = _fake_coco(tmp_path)
    ev = CocoKeypointEval(CocoIndex(ann_file))
    dets = [_det_from_ann(a) for a in anns[::2]]
    stats = dict(ev.evaluate(dets))
    assert stats["AP"] == pytest.approx(0.5, abs=0.06)
    assert stats["AR"] == pytest.approx(0.5, abs=0.06)


def test_false_positive_lowers_ap(tmp_path):
    ann_file, anns = _fake_coco(tmp_path)
    ev = CocoKeypointEval(CocoIndex(ann_file))
    dets = [_det_from_ann(a, score=0.9) for a in anns]
    fake = dict(dets[0])
    fake = {**fake, "score": 0.95,
            "keypoints": (np.array(fake["keypoints"]) + 1000).tolist()}
    stats = dict(ev.evaluate(dets + [fake]))
    assert stats["AP"] < 1.0
    assert stats["AR"] == pytest.approx(1.0)  # recall unaffected


def test_crowd_gt_ignored(tmp_path):
    ann_file, anns = _fake_coco(tmp_path, n_images=2, people_per_img=1)
    import json
    data = json.loads(open(ann_file).read())
    data["annotations"][0]["iscrowd"] = 1
    p = tmp_path / "ann2.json"
    p.write_text(json.dumps(data))
    ev = CocoKeypointEval(CocoIndex(str(p)))
    # detect only the non-crowd person
    dets = [_det_from_ann(anns[1])]
    stats = dict(ev.evaluate(dets))
    assert stats["AP"] == pytest.approx(1.0)


def test_compute_oks_identity():
    gt = {"keypoints": [100.0, 100.0, 2] * 17, "bbox": [80, 80, 40, 40],
          "area": 1600.0}
    dt = {"keypoints": [100.0, 100.0, 0.9] * 17}
    ious = compute_oks([gt], [dt])
    assert ious[0, 0] == pytest.approx(1.0)
