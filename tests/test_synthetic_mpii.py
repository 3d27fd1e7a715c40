"""make_synthetic_mpii: the on-disk MPII-format stack loads and evaluates.

Mirror of the synthetic-COCO coverage (test_synthetic_coco.py): the
generated layout must round-trip through the REAL pipeline pieces —
mpii.build_db (json 1-based coords + center/scale conventions), the
training loader, and mpii.evaluate's gt_<set>.mat PCKh — with gt-fed
predictions scoring exactly 100.
"""

import numpy as np
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.data import make_synthetic_mpii
from fhpe_tpu.data.mpii import build_db, evaluate


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synmpii"))
    ann = make_synthetic_mpii(root, "synval", num_images=8,
                              image_hw=(128, 128))
    return root, ann


def test_build_db_roundtrip(ds):
    root, _ = ds
    db = build_db(root, "synval")
    assert len(db) == 8
    rec = db[0]
    # 0-based joints, fully visible, 16 joints
    assert rec["joints_3d"].shape == (16, 3)
    assert (rec["joints_3d_vis"][:, 0] == 1).all()
    assert (rec["joints_3d"][:, :2] >= 0).all()
    assert (rec["joints_3d"][:, :2] < 128).all()
    # effective crop center restored to the image center after the
    # builder's +15*scale shift (scale then padded 1.25x)
    np.testing.assert_allclose(rec["center"], [64.0, 64.0])
    np.testing.assert_allclose(rec["scale"], [0.8, 0.8])


def test_crop_contains_joints(ds):
    """The (center, scale) crop window covers every stamped joint."""
    root, _ = ds
    db = build_db(root, "synval")
    for rec in db:
        half = rec["scale"] * 200.0 / 2.0
        lo = rec["center"] - half
        hi = rec["center"] + half
        j = rec["joints_3d"][:, :2]
        assert (j >= lo - 1e-9).all() and (j <= hi + 1e-9).all()


def test_gt_predictions_score_100(ds, tmp_path):
    root, _ = ds
    db = build_db(root, "synval")
    cfg = get_default_config()
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "synval"
    preds = np.stack([rec["joints_3d"][:, :2] for rec in db])
    nv, perf = evaluate(cfg, preds, str(tmp_path))
    assert perf == pytest.approx(100.0)
    assert nv["Head"] == pytest.approx(100.0)
    # 40px-off predictions fail the ~25px PCKh threshold
    _, perf_bad = evaluate(cfg, preds + 40.0, None)
    assert perf_bad == pytest.approx(0.0)


def test_loader_sample(ds):
    """The training loader warps a sample with joints in-crop."""
    from fhpe_tpu.data import PoseDataSource, dataset_meta

    root, _ = ds
    db = build_db(root, "synval")
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0
    cfg.DATASET.FLIP = False
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"],
                         joints_weight=meta["joints_weight"])
    s = src.get_sample(0, host_targets=True)
    assert s["image"].shape == (128, 128, 3)
    vis = s["joints_vis"] > 0
    assert vis.all()
    assert (s["joints"][vis] >= -1).all()
    assert (s["joints"][vis] <= 129).all()
    assert s["target"].max() == pytest.approx(1.0, abs=1e-5)
