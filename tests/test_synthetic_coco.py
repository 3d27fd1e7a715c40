"""Synthetic COCO-format dataset drives the REAL COCO pipeline end-to-end.

make_synthetic_coco writes the reference's on-disk layout
(images/<set>/%012d.jpg + annotations/person_keypoints_<set>.json,
lib/dataset/coco.py:244-257,434-442); these tests push it through the
actual production path: build_gt_db -> (GT as predictions) -> rescoring ->
OKS-NMS -> results JSON -> CocoKeypointEval.  Perfect predictions must
score AP = 1.0; corrupted ones must not.
"""

import os

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import build_db, make_synthetic_coco
from fhpe_tpu.data.coco import CocoIndex


IMAGE_SET = "synval2017"


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syncoco"))
    make_synthetic_coco(d, IMAGE_SET, num_images=8, image_hw=(128, 160))
    return d


def _cfg(root):
    cfg = get_default_config()
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = IMAGE_SET
    cfg.DATASET.TRAIN_SET = IMAGE_SET
    cfg.DATASET.CACHE_ROOT = ""   # default data/cache would pin the FIRST
    # tmp db forever (stale image paths on every later run)
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.IN_VIS_THRE = 0.2
    cfg.TEST.OKS_THRE = 0.9
    return cfg


def test_build_gt_db_from_synthetic_tree(root):
    cfg = _cfg(root)
    db = build_db(cfg, IMAGE_SET, is_train=False)
    assert len(db) == 8
    idx = CocoIndex(os.path.join(root, "annotations",
                                 f"person_keypoints_{IMAGE_SET}.json"))
    for rec in db:
        assert os.path.exists(rec["image"])
        img_id = int(os.path.splitext(os.path.basename(rec["image"]))[0])
        ann = idx.annotations(img_id)[0]
        kp = np.array(ann["keypoints"]).reshape(17, 3)
        np.testing.assert_array_equal(rec["joints_3d"][:, :2], kp[:, :2])
        assert rec["joints_3d_vis"][:, 0].sum() == 17


def _gt_as_predictions(db):
    n = len(db)
    preds = np.zeros((n, 17, 3), np.float32)
    boxes = np.zeros((n, 6))
    paths = []
    for i, rec in enumerate(db):
        preds[i, :, :2] = rec["joints_3d"][:, :2]
        preds[i, :, 2] = 1.0
        boxes[i, 0:2] = rec["center"]
        boxes[i, 2:4] = rec["scale"]
        boxes[i, 4] = np.prod(np.asarray(rec["scale"]) * 200)
        boxes[i, 5] = 1.0
        paths.append(rec["image"])
    return preds, boxes, paths


def test_full_coco_eval_stack_scores_perfect_ap(root, tmp_path):
    from fhpe_tpu.cli.common import make_evaluate_fn

    cfg = _cfg(root)
    db = build_db(cfg, IMAGE_SET, is_train=False)
    preds, boxes, paths = _gt_as_predictions(db)
    nv, perf = make_evaluate_fn(cfg)(cfg, preds, str(tmp_path), boxes, paths)
    assert nv["AP"] == pytest.approx(1.0), dict(nv)
    assert perf == pytest.approx(1.0)
    res = tmp_path / "results" / f"keypoints_{IMAGE_SET}_results_0.json"
    assert res.exists()


def test_corrupted_predictions_drop_ap(root, tmp_path):
    from fhpe_tpu.cli.common import make_evaluate_fn

    cfg = _cfg(root)
    db = build_db(cfg, IMAGE_SET, is_train=False)
    preds, boxes, paths = _gt_as_predictions(db)
    rng = np.random.RandomState(0)
    preds[:, :, :2] += rng.uniform(20, 40, preds[:, :, :2].shape)
    nv, perf = make_evaluate_fn(cfg)(cfg, preds, str(tmp_path), boxes, paths)
    assert nv["AP"] < 0.9
