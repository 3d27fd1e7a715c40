"""Eval-path sample parity against the reference JointsDataset.

In eval mode (is_train=False) the reference __getitem__ has no randomness:
read -> affine warp -> target generation (JointsDataset.py:113-198).  Run
the actual reference class (as oracle) on the same synthetic db and require
bit-identical warped images, joints, and targets from PoseDataSource.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_oracle

reference_oracle.install()

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import PoseDataSource, dataset_meta, make_synthetic_db


def _ref_cfg():
    return SimpleNamespace(
        OUTPUT_DIR="",
        DATASET=SimpleNamespace(
            DATA_FORMAT="jpg", SCALE_FACTOR=0.25, ROT_FACTOR=30, FLIP=True,
            NUM_JOINTS_HALF_BODY=8, PROB_HALF_BODY=-1.0, COLOR_RGB=False),
        MODEL=SimpleNamespace(
            TARGET_TYPE="gaussian", IMAGE_SIZE=[128, 128],
            HEATMAP_SIZE=[32, 32], SIGMA=2),
        LOSS=SimpleNamespace(USE_DIFFERENT_JOINTS_WEIGHT=False),
    )


def _our_cfg():
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.DATASET.COLOR_RGB = False
    return cfg


def test_eval_getitem_parity(tmp_path):
    from dataset.JointsDataset import JointsDataset

    db = make_synthetic_db(str(tmp_path), num_samples=6, image_hw=(180, 240))

    ref = JointsDataset(_ref_cfg(), root="", image_set="valid",
                        is_train=False, transform=None)
    ref.num_joints = 16
    meta = dataset_meta("mpii")
    ref.flip_pairs = meta["flip_pairs"]
    ref.upper_body_ids = meta["upper_body_ids"]
    ref.lower_body_ids = meta["lower_body_ids"]
    ref.aspect_ratio = 1.0
    ref.db = [dict(r) for r in db]

    ours = PoseDataSource(_our_cfg(), db, is_train=False,
                          flip_pairs=meta["flip_pairs"],
                          upper_body_ids=meta["upper_body_ids"])

    for i in range(len(db)):
        r_input, r_target, r_tw, r_meta = ref[i]
        s = ours.get_sample(i, host_targets=True)

        np.testing.assert_array_equal(s["image"], np.asarray(r_input))
        np.testing.assert_allclose(s["joints"],
                                   np.asarray(r_meta["joints"])[:, :2],
                                   atol=1e-9)
        # our target is NHWC; reference NCHW torch tensor
        np.testing.assert_allclose(
            np.transpose(s["target"], (2, 0, 1)), r_target.numpy(), atol=1e-6)
        np.testing.assert_allclose(s["target_weight"],
                                   r_tw.numpy()[:, 0], atol=0)
