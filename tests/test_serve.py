"""Serving predictor: parity with the eval step + padding/box plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.ops.decode import get_final_preds
from fhpe_tpu.serve import Predictor
from fhpe_tpu.serve.predictor import xywh_to_center_scale

J = 4
HW = 64


def _tiny_cfg():
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [HW, HW]
    cfg.MODEL.HEATMAP_SIZE = [HW // 4, HW // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.POST_PROCESS = True
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    model = get_pose_net(cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3)), train=False)
    return cfg, model, variables


def _crops(rng, n):
    crops = rng.randint(0, 256, size=(n, HW, HW, 3)).astype(np.uint8)
    centers = rng.uniform(100, 300, size=(n, 2))
    scales = rng.uniform(0.8, 2.0, size=(n, 2))
    return crops, centers, scales


def test_predict_crops_matches_host_oracle(setup):
    cfg, model, variables = setup
    p = Predictor(cfg, variables, batch_size=8, n_devices=4)
    rng = np.random.RandomState(0)
    crops, centers, scales = _crops(rng, 8)
    preds, maxvals = p.predict_crops(crops, centers, scales)

    from fhpe_tpu.ops.preprocess import normalize_images_jax
    x = np.asarray(normalize_images_jax(jnp.asarray(crops)))
    hm = np.asarray(model.apply(variables, x, train=False))
    if is_multi_output(model):
        hm = hm[-1]
    nchw = np.transpose(hm, (0, 3, 1, 2))
    ref_preds, ref_vals = get_final_preds(nchw, centers, scales,
                                          post_process=True)
    np.testing.assert_allclose(preds, ref_preds[:, :, :2],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(maxvals, ref_vals[..., 0], rtol=1e-4,
                               atol=1e-5)


def test_padding_and_chunking_invariance(setup):
    """Any request size gives per-sample results identical to a full
    batch — the pad rows and chunk boundaries must not leak."""
    cfg, model, variables = setup
    p = Predictor(cfg, variables, batch_size=8, n_devices=4)
    rng = np.random.RandomState(1)
    crops, centers, scales = _crops(rng, 13)  # 8 + padded 5
    preds_a, vals_a = p.predict_crops(crops, centers, scales)
    assert preds_a.shape == (13, J, 2) and vals_a.shape == (13, J)
    for lo, hi in [(0, 8), (8, 13)]:
        preds_b, vals_b = p.predict_crops(crops[lo:hi], centers[lo:hi],
                                          scales[lo:hi])
        np.testing.assert_allclose(preds_a[lo:hi], preds_b, rtol=1e-5,
                                   atol=1e-5)
        np.testing.assert_allclose(vals_a[lo:hi], vals_b, rtol=1e-5,
                                   atol=1e-5)


def test_flip_test_matches_eval_step(setup):
    """Predictor FLIP_TEST output == the (already parity-proven) eval
    step's preds/maxvals on the same batch."""
    cfg, model, variables = setup
    cfg = cfg.clone()
    cfg.DATASET.DATASET = "synthetic"  # MPII flip pairs, J=16 > our J=4
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TEST.POST_PROCESS = True

    # predictor with tiny-J flip pairs
    from fhpe_tpu.data import dataset_meta
    meta = {"num_joints": J, "flip_pairs": [[0, 1], [2, 3]]}
    import fhpe_tpu.serve.predictor as sp
    orig = sp.dataset_meta
    sp.dataset_meta = lambda name: meta
    try:
        p = Predictor(cfg, variables, batch_size=8, n_devices=4)
    finally:
        sp.dataset_meta = orig

    rng = np.random.RandomState(2)
    crops, centers, scales = _crops(rng, 8)
    preds, maxvals = p.predict_crops(crops, centers, scales)

    from fhpe_tpu.geometry.flip import flip_pair_permutation
    from fhpe_tpu.ops.decode import make_inverse_transforms
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.step import make_eval_step
    mesh = get_mesh(4)
    estep = make_eval_step(model, cfg, mesh, is_multi_output(model),
                           flip_perm=flip_pair_permutation(
                               J, meta["flip_pairs"]))
    batch = {
        "image": jnp.asarray(crops),
        "target": jnp.zeros((8, HW // 4, HW // 4, J), jnp.float32),
        "target_weight": jnp.ones((8, J), jnp.float32),
        "inv_trans": jnp.asarray(make_inverse_transforms(
            centers, scales, (HW // 4, HW // 4))),
    }
    out = estep({"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                shard_batch(mesh, batch))
    np.testing.assert_allclose(preds, np.asarray(out["preds"]), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(maxvals, np.asarray(out["maxvals"]),
                               rtol=1e-5, atol=1e-5)


def test_predict_boxes_end_to_end(setup):
    cfg, model, variables = setup
    cfg = cfg.clone()
    p = None
    import fhpe_tpu.serve.predictor as sp
    meta = {"num_joints": J, "flip_pairs": [[0, 1], [2, 3]]}
    orig = sp.dataset_meta
    sp.dataset_meta = lambda name: meta
    try:
        p = Predictor(cfg, variables, batch_size=4, n_devices=4)
    finally:
        sp.dataset_meta = orig

    rng = np.random.RandomState(3)
    frame = rng.randint(0, 256, size=(480, 640, 3)).astype(np.uint8)
    boxes = [(50, 40, 120, 240), (300, 100, 200, 150), (10, 10, 64, 64)]
    out = p.predict(frame, boxes)
    assert out.shape == (3, J, 3)
    assert np.isfinite(out).all()

    # consistency with the crop-level API
    c0, s0 = xywh_to_center_scale(boxes[0], p.aspect_ratio)
    crop0 = p.crop(frame, c0, s0)
    preds, vals = p.predict_crops(crop0[None], c0[None], s0[None])
    np.testing.assert_allclose(out[0, :, :2], preds[0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(out[0, :, 2], vals[0], rtol=1e-5, atol=1e-5)

    # empty request
    empty = p.predict(frame, [])
    assert empty.shape == (0, J, 3)


def test_xywh_center_scale_convention():
    """Matches the COCO loader's box -> center/scale parametrization."""
    from fhpe_tpu.data.coco import xywh2cs
    for box in [(10, 20, 100, 50), (0, 0, 30, 300), (5, 5, 64, 64)]:
        c, s = xywh_to_center_scale(box, 0.75)
        c_ref, s_ref = xywh2cs(*box, aspect_ratio=0.75)
        np.testing.assert_allclose(c, c_ref)
        np.testing.assert_allclose(s, s_ref)
