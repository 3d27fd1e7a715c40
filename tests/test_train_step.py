"""SPMD train/FPD/eval step tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.geometry import flip_pair_permutation, flip_back
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.ops.decode import get_final_preds, make_inverse_transforms
from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
from fhpe_tpu.train.state import (create_train_state, lr_for_epoch,
                                  make_optimizer, set_lr)
from fhpe_tpu.train.step import (make_eval_step, make_fpd_train_step,
                                 make_train_step)

J = 4
HW = 64  # input size; heatmap 16


def _tiny_cfg(stacks=1):
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [HW, HW]
    cfg.MODEL.HEATMAP_SIZE = [HW // 4, HW // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = stacks
    cfg.MODEL.EXTRA.NUM_FEATURES = 64
    cfg.TRAIN.LR = 1e-3
    return cfg


def _batch(rng, b=8):
    img = rng.normal(size=(b, HW, HW, 3)).astype(np.float32)
    tgt = rng.uniform(size=(b, HW // 4, HW // 4, J)).astype(np.float32)
    tw = np.ones((b, J), np.float32)
    return {"image": jnp.asarray(img), "target": jnp.asarray(tgt),
            "target_weight": jnp.asarray(tw)}


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(8)


def _fresh(state):
    """Deep-copy device buffers: steps donate their input state."""
    return jax.tree_util.tree_map(jnp.array, state)


@pytest.fixture(scope="module")
def _setup(mesh):
    cfg = _tiny_cfg()
    model = get_pose_net(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, rng, jnp.zeros((1, HW, HW, 3)))
    return cfg, model, state


@pytest.fixture()
def setup(_setup):
    cfg, model, state = _setup
    return cfg, model, _fresh(state)


def test_train_step_loss_decreases(mesh, setup):
    cfg, model, state = setup
    step = make_train_step(model, cfg, mesh, is_multi_output(model))
    rng = np.random.RandomState(0)
    batch = shard_batch(mesh, _batch(rng))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
    assert np.isfinite(losses).all()


def test_train_step_metrics_shapes(mesh, setup):
    cfg, model, state = setup
    step = make_train_step(model, cfg, mesh, is_multi_output(model))
    batch = shard_batch(mesh, _batch(np.random.RandomState(1)))
    _, metrics = step(state, batch)
    assert metrics["per_joint_acc"].shape == (J,)
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_lr_schedule():
    cfg = _tiny_cfg()
    cfg.TRAIN.LR = 0.001
    cfg.TRAIN.LR_STEP = [90, 110]
    cfg.TRAIN.LR_FACTOR = 0.1
    # The reference's effective schedule is shifted one epoch EARLY: the
    # MultiStepLR constructor's initial step plus the step() at the top of
    # every epoch (tools/train.py:209-210) mean a milestone at epoch m
    # kicks in from trained epoch m-1 (see lr_for_epoch docstring;
    # trajectory-pinned in test_trajectory_parity.py).
    assert lr_for_epoch(cfg, 0) == pytest.approx(1e-3)
    assert lr_for_epoch(cfg, 88) == pytest.approx(1e-3)
    assert lr_for_epoch(cfg, 89) == pytest.approx(1e-4)
    assert lr_for_epoch(cfg, 108) == pytest.approx(1e-4)
    assert lr_for_epoch(cfg, 109) == pytest.approx(1e-5)
    assert lr_for_epoch(cfg, 139) == pytest.approx(1e-5)


def test_set_lr_roundtrip(setup):
    cfg, model, state = setup
    s2 = set_lr(state, 0.5)
    assert float(s2.opt_state.hyperparams["learning_rate"]) == 0.5


def test_sgd_optimizer_builds():
    cfg = _tiny_cfg()
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.NESTEROV = True
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, opt, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_fpd_step(mesh):
    cfg = _tiny_cfg(stacks=2)
    cfg.KD.ALPHA = 0.5
    model = get_pose_net(cfg, dtype=jnp.float32)
    tcfg = _tiny_cfg(stacks=1)
    teacher = get_pose_net(tcfg, dtype=jnp.float32)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, rng, jnp.zeros((1, HW, HW, 3)))
    tvars = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, HW, HW, 3)),
                         train=False)

    step = make_fpd_train_step(model, teacher, cfg, mesh,
                               multi_output=True, teacher_multi_output=True)
    batch = shard_batch(mesh, _batch(np.random.RandomState(2)))
    tvars_before = jax.tree_util.tree_map(np.asarray, tvars)
    state, metrics = step(state, tvars, batch)
    total = float(metrics["loss"])
    pose, kd = float(metrics["pose_loss"]), float(metrics["kd_loss"])
    assert total == pytest.approx(0.5 * pose + 0.5 * kd, rel=1e-5)
    assert int(state.step) == 1
    # teacher variables must be untouched by the step (frozen, not donated)
    for before, after in zip(jax.tree_util.tree_leaves(tvars_before),
                             jax.tree_util.tree_leaves(tvars)):
        np.testing.assert_array_equal(before, np.asarray(after))


def test_eval_step_matches_numpy_decode(mesh, setup):
    cfg, model, state = setup
    cfg = cfg.clone()
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.POST_PROCESS = True
    estep = make_eval_step(model, cfg, mesh, is_multi_output(model))

    rng = np.random.RandomState(3)
    batch = _batch(rng)
    centers = rng.uniform(100, 300, size=(8, 2))
    scales = rng.uniform(0.8, 2.0, size=(8, 2))
    batch["inv_trans"] = jnp.asarray(
        make_inverse_transforms(centers, scales, (HW // 4, HW // 4)))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = estep(variables, shard_batch(mesh, batch))

    # independent host path: model forward -> numpy oracle decode
    hm = np.asarray(model.apply(variables, batch["image"], train=False))[-1]
    nchw = np.transpose(hm, (0, 3, 1, 2))
    ref_preds, ref_vals = get_final_preds(nchw, centers, scales,
                                          post_process=True)
    np.testing.assert_allclose(np.asarray(out["preds"]), ref_preds[:, :, :2],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["maxvals"]), ref_vals[..., 0],
                               rtol=1e-5)


def test_eval_step_flip_test_parity(mesh, setup):
    cfg, model, state = setup
    cfg = cfg.clone()
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TEST.POST_PROCESS = False
    pairs = [[0, 1], [2, 3]]
    perm = flip_pair_permutation(J, pairs)
    estep = make_eval_step(model, cfg, mesh, is_multi_output(model),
                           flip_perm=perm)

    rng = np.random.RandomState(4)
    batch = _batch(rng)
    centers = rng.uniform(100, 300, size=(8, 2))
    scales = rng.uniform(0.8, 2.0, size=(8, 2))
    batch["inv_trans"] = jnp.asarray(
        make_inverse_transforms(centers, scales, (HW // 4, HW // 4)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = estep(variables, shard_batch(mesh, batch))

    # reference flow on host (function.py:218-240) in NCHW numpy
    img = np.asarray(batch["image"])
    hm = np.asarray(model.apply(variables, img, train=False))[-1]
    hm_f = np.asarray(model.apply(variables, img[:, :, ::-1, :],
                                  train=False))[-1]
    nchw_f = np.transpose(hm_f, (0, 3, 1, 2))
    fb = flip_back(nchw_f, pairs)
    fb[:, :, :, 1:] = fb[:, :, :, 0:-1].copy()
    avg = (np.transpose(hm, (0, 3, 1, 2)) + fb) * 0.5
    ref_preds, _ = get_final_preds(avg, centers, scales, post_process=False)
    np.testing.assert_allclose(np.asarray(out["preds"]), ref_preds[:, :, :2],
                               rtol=1e-3, atol=1e-3)
