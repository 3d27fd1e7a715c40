"""Regression tests for the round-1 code-review findings."""

import json
import os
import zipfile

import numpy as np
import pytest

import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.data import BatchLoader, PoseDataSource, dataset_meta, make_synthetic_db
from fhpe_tpu.data.coco import CocoIndex
from fhpe_tpu.eval.coco_eval import CocoKeypointEval
from fhpe_tpu.geometry.targets import generate_target_jax, generate_target_np


def test_loader_no_deadlock_small_pool(tmp_path):
    """num_threads <= prefetch used to deadlock (shared executor)."""
    db = make_synthetic_db(str(tmp_path), num_samples=8, image_hw=(64, 64))
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, db, is_train=False,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    loader = BatchLoader(src, batch_size=4, num_threads=1, prefetch=2)
    batches = list(loader)
    assert len(batches) == 2


def test_zipreader_strips_leading_slash(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from fhpe_tpu.utils import zipreader

    img = np.full((10, 12, 3), 77, np.uint8)
    img_path = tmp_path / "x.jpg"
    cv2.imwrite(str(img_path), img)
    zpath = tmp_path / "images.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(img_path, "sub/x.jpg")

    # os.path.join-built path with '@/' — the zip-format dataset convention
    path = os.path.join(str(zpath) + "@", "sub", "x.jpg")
    out = zipreader.imread(path)
    assert out.shape == (10, 12, 3)


def _coco_index(tmp_path, anns, images):
    p = tmp_path / "ann.json"
    p.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "person"}]}))
    return CocoIndex(str(p))


def test_crowd_gt_rematch(tmp_path):
    """Two dets over one crowd gt: both must be ignored, not FP'd."""
    kp_zero = [0.0, 0.0, 0] * 17
    images = [{"id": 1, "width": 640, "height": 480, "file_name": "a.jpg"}]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [100, 100, 80, 80],
         "area": 6400.0, "iscrowd": 1, "keypoints": kp_zero,
         "num_keypoints": 0},
        {"id": 2, "image_id": 1, "category_id": 1, "bbox": [400, 100, 60, 90],
         "area": 5400.0, "iscrowd": 0,
         "keypoints": [410.0, 110.0, 2] * 17, "num_keypoints": 17},
    ]
    ev = CocoKeypointEval(_coco_index(tmp_path, anns, images))
    # perfect det for the real person + two dets inside the crowd box
    crowd_kp = [130.0, 130.0, 0.9] * 17
    crowd_kp2 = [135.0, 135.0, 0.9] * 17
    dets = [
        {"image_id": 1, "keypoints": [410.0, 110.0, 0.9] * 17, "score": 0.9},
        {"image_id": 1, "keypoints": crowd_kp, "score": 0.8},
        {"image_id": 1, "keypoints": crowd_kp2, "score": 0.7},
    ]
    stats = dict(ev.evaluate(dets))
    assert stats["AP"] == pytest.approx(1.0), stats


def test_area_range_gt_ordering(tmp_path):
    """Per-area-range matching must prefer in-range gts over area-ignored
    ones even when the det's OKS to the ignored gt is higher."""
    images = [{"id": 1, "width": 640, "height": 480, "file_name": "a.jpg"}]
    # large gt (out of medium range) and medium gt close together
    big_kp, med_kp = [], []
    for j in range(17):
        big_kp += [200.0 + 10 * j, 200.0, 2]
        med_kp += [205.0 + 10 * j, 205.0, 2]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1,
         "bbox": [150, 150, 160, 160], "area": 160.0 * 160.0, "iscrowd": 0,
         "keypoints": big_kp, "num_keypoints": 17},
        {"id": 2, "image_id": 1, "category_id": 1,
         "bbox": [180, 180, 60, 60], "area": 60.0 * 60.0, "iscrowd": 0,
         "keypoints": med_kp, "num_keypoints": 17},
    ]
    ev = CocoKeypointEval(_coco_index(tmp_path, anns, images))
    # one det exactly on the big gt (higher OKS to the big one), one on the
    # medium gt
    dets = [
        {"image_id": 1, "keypoints": [v if (i % 3) != 2 else 0.9
                                      for i, v in enumerate(big_kp)],
         "score": 0.95},
        {"image_id": 1, "keypoints": [v if (i % 3) != 2 else 0.9
                                      for i, v in enumerate(med_kp)],
         "score": 0.9},
    ]
    stats = dict(ev.evaluate(dets))
    # medium range: the medium gt must be matched (recall 1), not shadowed
    assert stats["AR (M)"] == pytest.approx(1.0), stats
    assert stats["AP (M)"] == pytest.approx(1.0), stats


def test_float_sigma_np_target_no_crash():
    joints = np.array([[100.0, 120.0, 0]])
    vis = np.ones((1, 3))
    t, w = generate_target_np(joints, vis, (64, 64), (256, 256), sigma=1.5)
    assert t.shape == (1, 64, 64)
    assert w[0, 0] == 1.0
    assert t.max() > 0.9


def test_float_sigma_jax_raises():
    with pytest.raises(ValueError, match="integer"):
        generate_target_jax(jnp.zeros((1, 2)), jnp.ones((1,)), (64, 64),
                            (256, 256), sigma=1.5)


def test_eval_step_padded_rows_masked():
    import jax
    from fhpe_tpu.models import get_pose_net, is_multi_output
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_eval_step
    from fhpe_tpu.ops.decode import make_inverse_transforms

    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 64
    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = get_mesh(8)
    estep = make_eval_step(model, cfg, mesh, is_multi_output(model))

    rng = np.random.RandomState(0)
    img = rng.randn(8, 64, 64, 3).astype(np.float32)
    tgt = rng.rand(8, 16, 16, 4).astype(np.float32)
    centers = rng.uniform(100, 300, (8, 2))
    scales = rng.uniform(0.8, 2, (8, 2))
    inv = make_inverse_transforms(centers, scales, (16, 16))

    def run(valid):
        batch = {
            "image": jnp.asarray(img), "target": jnp.asarray(tgt),
            "target_weight": jnp.ones((8, 4), jnp.float32),
            "inv_trans": jnp.asarray(inv),
            "valid": jnp.asarray(valid.astype(np.float32))}
        return estep(variables, shard_batch(mesh, batch))

    full = run(np.ones(8, bool))
    # poison the last 3 rows' targets: with them masked out, loss must
    # equal the loss over the first 5 rows only
    tgt2 = tgt.copy()
    tgt2[5:] = 100.0
    img5 = img
    batch_mask = np.zeros(8, bool)
    batch_mask[:5] = True

    out_masked = None
    # rebuild with poisoned targets
    def run2(valid, t):
        batch = {
            "image": jnp.asarray(img5), "target": jnp.asarray(t),
            "target_weight": jnp.ones((8, 4), jnp.float32),
            "inv_trans": jnp.asarray(inv),
            "valid": jnp.asarray(valid.astype(np.float32))}
        return estep(variables, shard_batch(mesh, batch))

    masked = run2(batch_mask, tgt2)
    clean5 = run2(batch_mask, tgt)
    np.testing.assert_allclose(float(masked["loss"]), float(clean5["loss"]),
                               rtol=1e-6)
    assert float(masked["loss"]) < 1.0  # poisoned rows excluded
    assert float(full["loss"]) != float(masked["loss"])


def test_deprecated_fused_eval_key_still_merges(tmp_path):
    """Configs saved by older runs contain 'FUSED_EVAL: false' under TPU;
    the key must stay mergeable as a deprecated no-op (round-4 advisor)."""
    import warnings

    import yaml

    from fhpe_tpu.config import load_config

    cfg_file = tmp_path / "old_run_config.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "MODEL": {"NAME": "hourglass",
                  "EXTRA": {"NUM_STACKS": 1, "NUM_FEATURES": 16}},
        "TPU": {"FUSED_EVAL": False},
    }))
    cfg = load_config(str(cfg_file))
    assert cfg.TPU.FUSED_EVAL is False

    cfg_file.write_text(yaml.safe_dump({"TPU": {"FUSED_EVAL": True}}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_config(str(cfg_file))
    assert any("FUSED_EVAL is deprecated" in str(x.message) for x in w)


def test_crop_no_cv2_fallback_rejects_float_images():
    """The native-warp fallback is uint8-only; float input used to be
    silently truncated to zeros (round-4 advisor)."""
    import builtins

    from fhpe_tpu.geometry import affine

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 disabled for test")
        return real_import(name, *a, **k)

    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    builtins.__import__ = no_cv2
    try:
        with pytest.raises(ValueError, match="uint8"):
            affine.crop(img, np.array([16.0, 16.0]),
                        np.array([0.16, 0.16]), (16, 16))
    finally:
        builtins.__import__ = real_import
