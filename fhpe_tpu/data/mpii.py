"""MPII dataset: index builder and PCKh evaluator.

Behavioral equivalent of the reference ``lib/dataset/mpii.py``: 16 joints,
left/right flip pairs, center/scale adjustment (+15*s y-shift, *1.25 scale,
1-based -> 0-based), pickle db cache keyed by dataset+split, and the
PCKh@0.5 evaluator against ``gt_<set>.mat`` (headbox * 0.6 normalizer,
pelvis/thorax masked out of the mean).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from collections import OrderedDict

import numpy as np

logger = logging.getLogger(__name__)

NUM_JOINTS = 16
FLIP_PAIRS = [[0, 5], [1, 4], [2, 3], [10, 15], [11, 14], [12, 13]]
PARENT_IDS = [1, 2, 6, 6, 3, 4, 6, 6, 7, 8, 11, 12, 7, 7, 13, 14]
UPPER_BODY_IDS = (7, 8, 9, 10, 11, 12, 13, 14, 15)
LOWER_BODY_IDS = (0, 1, 2, 3, 4, 5, 6)

# gt_valid.mat joint order (mpii.py:134-147 resolves these by name; the
# indices are fixed by the MPII toolkit convention)
JOINT_NAMES = ["rank", "rkne", "rhip", "lhip", "lkne", "lank", "pelvis",
               "thorax", "upper_neck", "head", "rwri", "relb", "rsho",
               "lsho", "lelb", "lwri"]


def build_db(root: str, image_set: str, data_format: str = "jpg",
             cache_root: str | None = None):
    """List of sample records (mpii.py:56-107), with optional pickle cache."""
    if cache_root:
        db_file = os.path.join(cache_root, f"mpii_cached_{image_set}_db.pkl")
        if os.path.exists(db_file):
            with open(db_file, "rb") as fd:
                return pickle.load(fd)

    file_name = os.path.join(root, "annot", image_set + ".json")
    with open(file_name) as f:
        anno = json.load(f)

    gt_db = []
    for a in anno:
        c = np.array(a["center"], dtype=np.float64)
        s = np.array([a["scale"], a["scale"]], dtype=np.float64)
        if c[0] != -1:
            c[1] = c[1] + 15 * s[1]
            s = s * 1.25
        c = c - 1  # matlab 1-based -> 0-based

        joints_3d = np.zeros((NUM_JOINTS, 3), dtype=np.float64)
        joints_3d_vis = np.zeros((NUM_JOINTS, 3), dtype=np.float64)
        if image_set != "test":
            joints = np.array(a["joints"], dtype=np.float64)
            joints[:, 0:2] = joints[:, 0:2] - 1
            joints_vis = np.array(a["joints_vis"], dtype=np.float64)
            assert len(joints) == NUM_JOINTS
            joints_3d[:, 0:2] = joints[:, 0:2]
            joints_3d_vis[:, 0] = joints_vis
            joints_3d_vis[:, 1] = joints_vis

        image_dir = "images.zip@" if data_format == "zip" else "images"
        gt_db.append({
            "image": os.path.join(root, image_dir, a["image"]),
            "center": c,
            "scale": s,
            "joints_3d": joints_3d,
            "joints_3d_vis": joints_3d_vis,
            "filename": "",
            "imgnum": 0,
        })

    if cache_root:
        os.makedirs(cache_root, exist_ok=True)
        with open(db_file, "wb") as fd:
            pickle.dump(gt_db, fd)
    return gt_db


def evaluate(cfg, preds, output_dir: str | None = None):
    """PCKh evaluation against gt_<TEST_SET>.mat (mpii.py:109-194).

    preds: (N, J, >=2) predicted joint locations in original image coords,
    0-based; converted to 1-based to match the matlab gt.
    Returns (OrderedDict of named metrics, Mean PCKh@0.5).
    """
    from scipy.io import loadmat, savemat

    preds = np.asarray(preds)[:, :, 0:2] + 1.0

    if output_dir:
        savemat(os.path.join(output_dir, "pred.mat"), mdict={"preds": preds})

    if "test" in cfg.DATASET.TEST_SET:
        return OrderedDict([("Null", 0.0)]), 0.0

    sc_bias = 0.6
    threshold = 0.5

    gt_file = os.path.join(cfg.DATASET.ROOT, "annot",
                           f"gt_{cfg.DATASET.TEST_SET}.mat")
    gt = loadmat(gt_file)
    dataset_joints = gt["dataset_joints"]
    jnt_missing = gt["jnt_missing"]
    pos_gt_src = gt["pos_gt_src"]
    headboxes_src = gt["headboxes_src"]

    pos_pred_src = np.transpose(preds, [1, 2, 0])

    def jid(name):
        return np.where(dataset_joints == name)[1][0]

    jnt_visible = 1 - jnt_missing
    uv_err = np.linalg.norm(pos_pred_src - pos_gt_src, axis=1)
    headsizes = headboxes_src[1, :, :] - headboxes_src[0, :, :]
    headsizes = np.linalg.norm(headsizes, axis=0) * sc_bias
    scale = headsizes * np.ones((len(uv_err), 1))
    scaled_uv_err = (uv_err / scale) * jnt_visible
    jnt_count = np.sum(jnt_visible, axis=1)
    less = (scaled_uv_err <= threshold) * jnt_visible
    pckh = 100.0 * np.sum(less, axis=1) / jnt_count

    rng = np.arange(0, 0.5 + 0.01, 0.01)
    pck_all = np.zeros((len(rng), 16))
    for r, thr in enumerate(rng):
        less = (scaled_uv_err <= thr) * jnt_visible
        pck_all[r, :] = 100.0 * np.sum(less, axis=1) / jnt_count

    pckh = np.ma.array(pckh, mask=False)
    pckh.mask[6:8] = True  # mask pelvis/thorax out of the mean
    jnt_count = np.ma.array(jnt_count, mask=False)
    jnt_count.mask[6:8] = True
    jnt_ratio = jnt_count / np.sum(jnt_count).astype(np.float64)

    name_value = OrderedDict([
        ("Head", pckh[jid("head")]),
        ("Shoulder", 0.5 * (pckh[jid("lsho")] + pckh[jid("rsho")])),
        ("Elbow", 0.5 * (pckh[jid("lelb")] + pckh[jid("relb")])),
        ("Wrist", 0.5 * (pckh[jid("lwri")] + pckh[jid("rwri")])),
        ("Hip", 0.5 * (pckh[jid("lhip")] + pckh[jid("rhip")])),
        ("Knee", 0.5 * (pckh[jid("lkne")] + pckh[jid("rkne")])),
        ("Ankle", 0.5 * (pckh[jid("lank")] + pckh[jid("rank")])),
        ("Mean", np.sum(pckh * jnt_ratio)),
        ("Mean@0.1", np.sum(pck_all[11, :] * jnt_ratio)),
    ])
    return name_value, name_value["Mean"]
