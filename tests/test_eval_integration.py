"""End-to-end evaluator integration:

* COCO: synthetic COCO-format dataset on disk -> build_gt_db -> fabricated
  predictions -> rescore + OKS-NMS + results JSON -> CocoKeypointEval AP.
* MPII: synthetic gt_valid.mat -> evaluate() PCKh with known error levels.
"""

import json
import os

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import build_db
from fhpe_tpu.data.coco import CocoIndex, rescore_and_nms, write_results_json
from fhpe_tpu.data.mpii import evaluate as mpii_evaluate
from fhpe_tpu.eval.coco_eval import CocoKeypointEval

cv2 = pytest.importorskip("cv2")
scipy = pytest.importorskip("scipy")


def _make_coco_dataset(root, n_images=6, seed=0):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images", "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, anns = [], []
    aid = 1
    for i in range(1, n_images + 1):
        w, h = 320, 240
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:012d}.jpg"), img)
        images.append({"id": i, "width": w, "height": h,
                       "file_name": f"{i:012d}.jpg"})
        x, y = rng.uniform(30, 120), rng.uniform(20, 80)
        bw, bh = rng.uniform(80, 150), rng.uniform(100, 140)
        kp = []
        for j in range(17):
            kp += [float(x + rng.uniform(0, bw)),
                   float(y + rng.uniform(0, bh)), 2]
        anns.append({"id": aid, "image_id": i, "category_id": 1,
                     "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0,
                     "keypoints": kp, "num_keypoints": 17})
        aid += 1

    with open(os.path.join(ann_dir, "person_keypoints_val2017.json"),
              "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person",
                                   "supercategory": "person"}]}, f)
    return anns


def test_coco_end_to_end(tmp_path):
    root = str(tmp_path / "coco")
    anns = _make_coco_dataset(root)

    cfg = get_default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.CACHE_ROOT = str(tmp_path / "cache")
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.TEST.USE_GT_BBOX = True

    db = build_db(cfg, "val2017", is_train=False)
    assert len(db) == len(anns)
    assert db[0]["image"].endswith(".jpg")
    assert os.path.exists(db[0]["image"])

    # fabricate near-perfect predictions from the gt
    n = len(db)
    preds = np.zeros((n, 17, 3))
    all_boxes = np.zeros((n, 6))
    img_paths = []
    for i, (rec, ann) in enumerate(zip(db, anns)):
        kp = np.array(ann["keypoints"]).reshape(17, 3)
        preds[i, :, :2] = kp[:, :2] + 0.5  # half-pixel error
        preds[i, :, 2] = 0.95
        all_boxes[i, 0:2] = rec["center"]
        all_boxes[i, 2:4] = rec["scale"]
        all_boxes[i, 4] = np.prod(np.asarray(rec["scale"]) * 200)
        all_boxes[i, 5] = 1.0
        img_paths.append(rec["image"])

    nmsed = rescore_and_nms(preds, all_boxes, img_paths, in_vis_thre=0.2,
                            oks_thre=0.9)
    res_file = str(tmp_path / "results" / "kpts.json")
    results = write_results_json(nmsed, res_file)
    assert os.path.exists(res_file)

    ann_file = os.path.join(root, "annotations",
                            "person_keypoints_val2017.json")
    stats = dict(CocoKeypointEval(CocoIndex(ann_file)).evaluate(results))
    assert stats["AP"] > 0.99
    assert stats["AR"] > 0.99

    # degrade predictions heavily -> AP collapses
    bad = [dict(r, keypoints=(np.array(r["keypoints"]) + 500).tolist())
           for r in results]
    stats_bad = dict(CocoKeypointEval(CocoIndex(ann_file)).evaluate(bad))
    assert stats_bad["AP"] < 0.05


def test_mpii_evaluate_pckh(tmp_path):
    from scipy.io import savemat

    rng = np.random.RandomState(0)
    n, j = 20, 16
    joint_names = np.zeros((1, j), dtype=object)
    names = ["rank", "rkne", "rhip", "lhip", "lkne", "lank", "pelvis",
             "thorax", "upper_neck", "head", "rwri", "relb", "rsho",
             "lsho", "lelb", "lwri"]
    for i, nm in enumerate(names):
        joint_names[0, i] = nm

    pos_gt = rng.uniform(50, 400, size=(j, 2, n))
    headboxes = np.zeros((2, 2, n))
    headboxes[0] = pos_gt[names.index("head")] - 30
    headboxes[1] = pos_gt[names.index("head")] + 30
    # headsize = ||60,60|| * 0.6 ~ 50.9 -> thr 0.5 => 25.5 px allowed
    jnt_missing = np.zeros((j, n))

    root = tmp_path / "mpii" / "annot"
    root.mkdir(parents=True)
    savemat(str(root / "gt_valid.mat"),
            {"dataset_joints": joint_names, "jnt_missing": jnt_missing,
             "pos_gt_src": pos_gt, "headboxes_src": headboxes})

    cfg = get_default_config()
    cfg.DATASET.ROOT = str(tmp_path / "mpii")
    cfg.DATASET.TEST_SET = "valid"

    # predictions: 10px error -> all within 25.5px -> PCKh = 100
    preds = np.transpose(pos_gt, (2, 0, 1)) - 1 + 10 / np.sqrt(2)
    nv, perf = mpii_evaluate(cfg, preds, str(tmp_path))
    assert perf == pytest.approx(100.0)
    assert nv["Head"] == pytest.approx(100.0)
    assert os.path.exists(tmp_path / "pred.mat")

    # 40px error -> all outside -> 0
    preds_bad = np.transpose(pos_gt, (2, 0, 1)) - 1 + 40
    _, perf_bad = mpii_evaluate(cfg, preds_bad, None)
    assert perf_bad == pytest.approx(0.0)


def test_detection_bbox_db(tmp_path):
    """USE_GT_BBOX=False path: detector results JSON -> eval db."""
    import json as _json
    from fhpe_tpu.data.coco import build_detection_db

    dets = [
        {"image_id": 42, "category_id": 1, "bbox": [10.0, 20.0, 100.0, 200.0],
         "score": 0.9},
        {"image_id": 42, "category_id": 1, "bbox": [5.0, 5.0, 50.0, 60.0],
         "score": 0.05},   # below IMAGE_THRE
        {"image_id": 43, "category_id": 3, "bbox": [0, 0, 10, 10],
         "score": 0.9},    # not a person
    ]
    bbox_file = tmp_path / "dets.json"
    bbox_file.write_text(_json.dumps(dets))

    db = build_detection_db("/root/x", "val2017", str(bbox_file),
                            aspect_ratio=192 / 256, image_thre=0.1)
    assert len(db) == 1
    rec = db[0]
    assert rec["image"].endswith("000000000042.jpg")
    assert rec["score"] == 0.9
    # bbox center; aspect-corrected scale * 1.25 / 200
    np.testing.assert_allclose(rec["center"], [60.0, 120.0])
    np.testing.assert_allclose(rec["scale"][1], 200.0 * 1.25 / 200.0)
    assert rec["joints_3d_vis"].all()
