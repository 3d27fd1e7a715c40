"""Train-path sample parity with matched RNG streams.

The reference __getitem__ draws randomness in a fixed order from the global
``np.random`` and ``random`` modules (JointsDataset.py:145-165); our
PoseDataSource uses a ``RandomState``/``random.Random`` pair that produces
the same streams when seeded identically.  Seeding both sides the same
therefore makes the *augmented* outputs bit-comparable: same half-body
decision, scale jitter, rotation, flip, warp, and targets.
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


def _ref_cfg(prob_half_body):
    return SimpleNamespace(
        OUTPUT_DIR="",
        DATASET=SimpleNamespace(
            DATA_FORMAT="jpg", SCALE_FACTOR=0.25, ROT_FACTOR=30, FLIP=True,
            NUM_JOINTS_HALF_BODY=8, PROB_HALF_BODY=prob_half_body,
            COLOR_RGB=False),
        MODEL=SimpleNamespace(
            TARGET_TYPE="gaussian", IMAGE_SIZE=[128, 128],
            HEATMAP_SIZE=[32, 32], SIGMA=2),
        LOSS=SimpleNamespace(USE_DIFFERENT_JOINTS_WEIGHT=False),
    )


def _our_cfg(prob_half_body):
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.DATASET.PROB_HALF_BODY = prob_half_body
    cfg.DATASET.SCALE_FACTOR = 0.25
    cfg.DATASET.ROT_FACTOR = 30
    return cfg


@pytest.mark.parametrize("prob_half_body", [-1.0, 0.5])
def test_train_getitem_parity(tmp_path, prob_half_body):
    from dataset.JointsDataset import JointsDataset

    db = make_synthetic_db(str(tmp_path), num_samples=8, image_hw=(180, 240),
                           seed=11)
    meta = dataset_meta("mpii")

    ref = JointsDataset(_ref_cfg(prob_half_body), root="", image_set="train",
                        is_train=True, transform=None)
    ref.num_joints = 16
    ref.flip_pairs = meta["flip_pairs"]
    ref.upper_body_ids = meta["upper_body_ids"]
    ref.lower_body_ids = meta["lower_body_ids"]
    ref.aspect_ratio = 1.0
    ref.db = [dict(r) for r in db]

    for i in range(len(db)):
        seed = 1000 + i
        with reference_oracle.seeded_global_rng(seed):
            r_input, r_target, r_tw, r_meta = ref[i]

        ours = PoseDataSource(_our_cfg(prob_half_body), db, is_train=True,
                              flip_pairs=meta["flip_pairs"],
                              upper_body_ids=meta["upper_body_ids"],
                              seed=seed)
        s = ours.get_sample(i, host_targets=True)

        np.testing.assert_array_equal(s["image"], np.asarray(r_input))
        np.testing.assert_allclose(
            np.transpose(s["target"], (2, 0, 1)), r_target.numpy(), atol=1e-6)
        np.testing.assert_allclose(s["target_weight"], r_tw.numpy()[:, 0])
        np.testing.assert_allclose(s["rotation"], r_meta["rotation"],
                                   atol=1e-9)
