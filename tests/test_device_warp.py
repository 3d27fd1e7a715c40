"""TPU.DEVICE_WARP path: on-device crop from letterbox canvases.

Correctness: the device-warped crop must closely match the host cv2 warp of
the original image (one extra bilinear resampling through the canvas is the
only difference), flips must fold into the matrix correctly, and a train
step must run end-to-end on canvas batches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.data import PoseDataSource, dataset_meta, make_synthetic_db
from fhpe_tpu.ops.preprocess import warp_affine_jax

cv2 = pytest.importorskip("cv2")


def _cfg(device_warp=True, canvas=(256, 256)):
    cfg = get_default_config()
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.MODEL.HEATMAP_SIZE = [32, 32]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.TPU.DEVICE_WARP = device_warp
    cfg.TPU.CANVAS_SIZE = list(canvas)
    return cfg


def _sources(tmp_path, seed=3):
    db = make_synthetic_db(str(tmp_path), num_samples=6, image_hw=(200, 240))
    meta = dataset_meta("mpii")
    kw = dict(flip_pairs=meta["flip_pairs"],
              upper_body_ids=meta["upper_body_ids"], seed=seed)
    dev = PoseDataSource(_cfg(True), db, is_train=True, **kw)
    host = PoseDataSource(_cfg(False), db, is_train=True, **kw)
    return dev, host


def test_device_warp_matches_host_warp(tmp_path):
    dev, host = _sources(tmp_path)
    for i in range(6):
        s_dev = dev.get_sample(i)
        s_host = host.get_sample(i)  # same seed -> same augmentation draws
        assert "canvas" in s_dev and "image" in s_host
        warped = np.asarray(warp_affine_jax(
            jnp.asarray(s_dev["canvas"][None]),
            jnp.asarray(s_dev["warp_inv"][None]), (128, 128)))[0]
        ref = s_host["image"].astype(np.float32)
        # one extra bilinear resample through the canvas: small smoothing
        diff = np.abs(warped - ref)
        assert diff.mean() < 6.0, diff.mean()
        assert np.median(diff) < 3.0
        # joints identical (host-side math is shared)
        np.testing.assert_allclose(s_dev["joints"], s_host["joints"])


def test_device_warp_flip_folds_into_matrix(tmp_path):
    """Flipped samples (p=0.5) must still match the host path, proving the
    mirror composition is correct; the test requires that flips actually
    occurred (sample['flipped'] + negative determinant of the matrix)."""
    dev, host = _sources(tmp_path, seed=9)
    flipped_count = 0
    for i in range(6):
        s_dev = dev.get_sample(i)
        s_host = host.get_sample(i)
        assert s_dev["flipped"] == s_host["flipped"]  # same RNG stream
        if s_dev["flipped"]:
            flipped_count += 1
            # mirror composition flips orientation: det of linear part < 0
            assert np.linalg.det(s_dev["warp_inv"][:, :2]) < 0
        warped = np.asarray(warp_affine_jax(
            jnp.asarray(s_dev["canvas"][None]),
            jnp.asarray(s_dev["warp_inv"][None]), (128, 128)))[0]
        assert np.abs(warped - s_host["image"].astype(np.float32)).mean() < 6.0
    assert flipped_count > 0, "seed produced no flips; test exercised nothing"


def test_eval_ignores_device_warp(tmp_path):
    db = make_synthetic_db(str(tmp_path), num_samples=2, image_hw=(128, 128))
    meta = dataset_meta("mpii")
    src = PoseDataSource(_cfg(True), db, is_train=False,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    s = src.get_sample(0)
    assert "image" in s and "canvas" not in s


def test_train_step_on_canvas_batch(tmp_path):
    from fhpe_tpu.models import get_pose_net
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.state import create_train_state
    from fhpe_tpu.train.step import make_batch_preprocessor, make_train_step
    from fhpe_tpu.data import BatchLoader

    cfg = _cfg(True, canvas=(128, 128))
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 64

    db = make_synthetic_db(str(tmp_path), num_samples=8, image_hw=(100, 120))
    meta = dataset_meta("mpii")
    src = PoseDataSource(cfg, db, is_train=True,
                         flip_pairs=meta["flip_pairs"],
                         upper_body_ids=meta["upper_body_ids"])
    loader = BatchLoader(src, batch_size=8, drop_last=True)
    batch = next(iter(loader))
    assert batch["canvas"].shape == (8, 128, 128, 3)

    mesh = get_mesh(8)
    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    prep = make_batch_preprocessor(cfg)
    step = make_train_step(model, cfg, mesh, True, prepare=prep)
    dev = shard_batch(mesh, {k: jnp.asarray(batch[k]) for k in
                             ("canvas", "warp_inv", "joints", "joints_vis")})
    losses = []
    for _ in range(3):
        state, m = step(state, dev)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
