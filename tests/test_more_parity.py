"""Additional parity/robustness tests: half-body transform vs the reference
(matched RNG streams), checkpoint resume roundtrip, OHKM train step."""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.data import dataset_meta
from fhpe_tpu.data.loader import half_body_transform
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
from fhpe_tpu.train.state import create_train_state, set_lr
from fhpe_tpu.train.step import make_train_step
from fhpe_tpu.utils.checkpoint import (auto_resume, save_checkpoint,
                                       save_final_state, load_model_weights)


def test_half_body_matches_reference():
    """np.random.seed(k) and RandomState(k) yield the same stream, so the
    reference half_body_transform (global np.random) and ours (RandomState)
    can be compared draw-for-draw."""
    torch = pytest.importorskip("torch")
    import reference_oracle
    reference_oracle.install()
    from dataset.JointsDataset import JointsDataset

    meta = dataset_meta("mpii")
    ref = JointsDataset.__new__(JointsDataset)
    ref.num_joints = 16
    ref.upper_body_ids = meta["upper_body_ids"]
    ref.lower_body_ids = meta["lower_body_ids"]
    ref.aspect_ratio = 1.0
    ref.pixel_std = 200

    rng_master = np.random.RandomState(3)
    for trial in range(10):
        joints = rng_master.uniform(0, 300, size=(16, 3))
        vis = np.zeros((16, 3))
        vis[:, 0] = (rng_master.rand(16) > 0.3)

        with reference_oracle.seeded_global_rng(100 + trial):
            c_ref, s_ref = ref.half_body_transform(joints, vis)

        ours_rng = np.random.RandomState(100 + trial)
        c_our, s_our = half_body_transform(
            joints, vis, 16, meta["upper_body_ids"], 1.0, ours_rng)

        if c_ref is None:
            assert c_our is None
        else:
            np.testing.assert_allclose(c_our, c_ref, atol=1e-6)
            np.testing.assert_allclose(s_our, s_ref, atol=1e-6)


def _tiny_setup():
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
    return cfg, model, state


def test_checkpoint_resume_roundtrip(tmp_path):
    cfg, model, state = _tiny_setup()
    mesh = get_mesh(8)
    step = make_train_step(model, cfg, mesh, True)
    rs = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(8, 64, 64, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(8, 16, 16, 4), jnp.float32),
        "target_weight": jnp.ones((8, 4), jnp.float32)})
    state, _ = step(state, batch)
    state = set_lr(state, 0.0005)

    save_checkpoint(str(tmp_path), state, epoch=7, perf=0.42, is_best=True)
    save_final_state(str(tmp_path), state)

    _, _, fresh = _tiny_setup()
    restored, epoch, perf = auto_resume(str(tmp_path), fresh)
    assert epoch == 7 and perf == pytest.approx(0.42)
    assert int(restored.step) == int(state.step)
    assert float(restored.opt_state.hyperparams["learning_rate"]) == \
        pytest.approx(0.0005)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # model_best snapshot loads as weights
    w = load_model_weights(str(tmp_path / "model_best.msgpack"))
    assert "params" in w and "batch_stats" in w


def test_ohkm_train_step_runs():
    cfg, model, state = _tiny_setup()
    cfg.LOSS.USE_OHKM = True
    cfg.LOSS.TOPK = 2
    mesh = get_mesh(8)
    step = make_train_step(model, cfg, mesh, True)
    rs = np.random.RandomState(1)
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rs.randn(8, 64, 64, 3), jnp.float32),
        "target": jnp.asarray(rs.rand(8, 16, 16, 4), jnp.float32),
        "target_weight": jnp.ones((8, 4), jnp.float32)})
    losses = []
    for _ in range(4):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_fpd_kd_weight_from_teacher_cfg():
    """KD term gates target_weight by the TEACHER config's flag
    (reference fpd_train.py:145-147)."""
    import jax.numpy as jnp
    from fhpe_tpu.train.loss import fpd_loss

    rng = np.random.RandomState(21)
    s_out = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    teacher = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray((rng.rand(2, 4) > 0.5).astype(np.float32))

    _, pose_a, kd_unweighted = fpd_loss(
        s_out, teacher, tgt, w, 0.5,
        use_target_weight_pose=True, use_target_weight_kd=False)
    _, pose_b, kd_weighted = fpd_loss(
        s_out, teacher, tgt, w, 0.5,
        use_target_weight_pose=True, use_target_weight_kd=True)
    assert float(pose_a) == float(pose_b)       # pose unaffected
    assert float(kd_unweighted) != float(kd_weighted)


def test_train_step_macro_pck():
    """Step 'acc' is the macro (per-joint-averaged) PCK with acc_cnt =
    number of counted joints, matching reference accuracy()."""
    import jax.numpy as jnp
    from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
    from fhpe_tpu.train.step import make_train_step

    cfg, model, state = _tiny_setup()
    mesh = get_mesh(8)
    step = make_train_step(model, cfg, mesh, True)
    # gt heatmaps: joint 0 peak at a valid location for ALL samples; other
    # joints invalid (peak at (0,0) -> excluded by the >1 rule)
    tgt = np.zeros((8, 16, 16, 4), np.float32)
    tgt[:, 5, 7, 0] = 1.0
    batch = shard_batch(mesh, {
        "image": jnp.asarray(np.random.RandomState(3).randn(8, 64, 64, 3),
                             jnp.float32),
        "target": jnp.asarray(tgt),
        "target_weight": jnp.ones((8, 4), jnp.float32)})
    _, m = step(state, batch)
    assert int(m["acc_cnt"]) == 1          # only joint 0 counted
    pj = np.asarray(m["per_joint_acc"])
    assert (pj[1:] == -1).all()            # others marked invalid
    assert float(m["acc"]) == pytest.approx(float(pj[0]))
