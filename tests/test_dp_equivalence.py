"""Data-parallel correctness: the 8-device shard_map train step must equal a
single-device DataParallel-semantics oracle on the same global batch.

This is the strongest multichip-correctness evidence available without
hardware (VERDICT round-1 item #7).  The oracle reproduces exactly what the
SPMD step is specified to compute — and what the reference's
``nn.DataParallel`` computes (tools/train.py:142): split the global batch
into per-device shards, run the forward/backward per shard with PER-SHARD
BatchNorm statistics (DataParallel never syncs BN), average the shard
gradients, apply one optimizer update.  Both BN_STATS reconciliation modes
are covered:

* ``device0`` — keep shard 0's updated running stats (DataParallel keeps the
  master replica's buffers);
* ``mean`` — cross-shard mean of the updated running stats.

Comparison protocol: free-running multi-step trajectories diverge by f32
chaos alone (measured: two mathematically-identical oracles compiled with
different fusion orders differ ~1e-2 in loss by step 3 — BatchNorm variance
at per-shard batch 2 amplifies rounding), so each step is compared
one-step-synced: the oracle restarts from the SPMD state before every step,
and the post-step loss/params/stats must agree to f32 tolerance.  Semantic
errors (sum-vs-mean, wrong BN mode, shard misassignment) are O(1) relative
and cannot hide under these tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
from fhpe_tpu.train.loss import fpd_loss, stacked_mse_loss
from fhpe_tpu.train.state import create_train_state
from fhpe_tpu.train.step import make_fpd_train_step, make_train_step

J = 4
HW = 64
NDEV = 8
B = 16  # global batch; per-device 2


def _cfg(stacks=1, feats=32):
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [HW, HW]
    cfg.MODEL.HEATMAP_SIZE = [HW // 4, HW // 4]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = stacks
    cfg.MODEL.EXTRA.NUM_FEATURES = feats
    cfg.TRAIN.LR = 1e-3
    # SGD, not adam: adam's update is ±lr regardless of gradient magnitude,
    # so a sign flip on a noise-level gradient element shifts the param by
    # 2*lr — far above f32 noise.  SGD keeps param diffs linear in the
    # gradient diffs, which is what this test actually compares.
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.MOMENTUM = 0.9
    cfg.TRAIN.WD = 1e-4
    cfg.TRAIN.NESTEROV = True
    return cfg


def _batch(rng, b=B):
    img = rng.normal(size=(b, HW, HW, 3)).astype(np.float32)
    tgt = rng.uniform(size=(b, HW // 4, HW // 4, J)).astype(np.float32)
    tw = np.ones((b, J), np.float32)
    return {"image": img, "target": tgt, "target_weight": tw}


def _fresh(tree):
    return jax.tree_util.tree_map(jnp.array, tree)


def _assert_trees_close(a, b, rtol=1e-3, atol=1e-4):
    # f32 tolerance: the SPMD program and the per-shard oracle compile to
    # different XLA fusion/reduction orders, so bitwise equality is not
    # achievable; semantic errors (sum-vs-mean, wrong stats mode, shard
    # misassignment) show up as O(1) relative differences.
    fa, _ = jax.tree_util.tree_flatten_with_path(a)
    fb, _ = jax.tree_util.tree_flatten_with_path(b)
    assert len(fa) == len(fb)
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(pa))


def _dp_oracle_step(model, state, batch, multi_output, bn_stats,
                    teacher=None, tvars=None, t_multi=False, alpha=0.5):
    """One DataParallel-semantics update on a single device: per-shard BN
    stats and per-shard grads, grads averaged across shards."""

    def shard_loss(params, batch_stats, shard):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            shard["image"], train=True, mutable=["batch_stats"])
        if teacher is not None:
            t_out = teacher.apply(tvars, shard["image"], train=False)
            t_final = t_out[-1] if t_multi else t_out
            total, pose, kd = fpd_loss(
                outputs, jax.lax.stop_gradient(t_final), shard["target"],
                shard["target_weight"], alpha)
            return total, mutated["batch_stats"]
        loss = stacked_mse_loss(outputs, shard["target"],
                                shard["target_weight"])
        return loss, mutated["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(shard_loss, has_aux=True))
    shard_grads, shard_stats, shard_losses = [], [], []
    per_dev = batch["image"].shape[0] // NDEV
    for k in range(NDEV):
        sl = slice(k * per_dev, (k + 1) * per_dev)
        shard = {key: jnp.asarray(v[sl]) for key, v in batch.items()}
        (loss, stats), grads = grad_fn(state.params, state.batch_stats, shard)
        shard_grads.append(grads)
        shard_stats.append(stats)
        shard_losses.append(loss)

    mean_grads = jax.tree_util.tree_map(
        lambda *g: jnp.mean(jnp.stack(g), axis=0), *shard_grads)
    if bn_stats == "device0":
        new_stats = shard_stats[0]
    else:
        new_stats = jax.tree_util.tree_map(
            lambda *s: jnp.mean(jnp.stack(s), axis=0), *shard_stats)
    new_state = state.apply_gradients(mean_grads).replace(
        batch_stats=new_stats)
    return new_state, float(np.mean([float(l) for l in shard_losses]))


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(NDEV)


@pytest.mark.parametrize("bn_stats", ["device0", "mean"])
def test_train_step_matches_dataparallel_oracle(mesh, bn_stats):
    cfg = _cfg()
    model = get_pose_net(cfg, dtype=jnp.float32)
    state0 = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                jnp.zeros((1, HW, HW, 3)))
    step = make_train_step(model, cfg, mesh, is_multi_output(model),
                           bn_stats=bn_stats)

    rng = np.random.RandomState(7)
    state_spmd = _fresh(state0)
    for i in range(3):
        batch = _batch(rng)
        pre = _fresh(state_spmd)  # oracle restarts from the SPMD state
        state_spmd, metrics = step(state_spmd, shard_batch(mesh, batch))
        state_orc, loss_orc = _dp_oracle_step(
            model, pre, batch, is_multi_output(model), bn_stats)
        np.testing.assert_allclose(float(metrics["loss"]), loss_orc,
                                   rtol=1e-3, err_msg=f"step {i}")
        _assert_trees_close(state_spmd.params, state_orc.params)
        _assert_trees_close(state_spmd.batch_stats, state_orc.batch_stats)


def test_fpd_step_matches_dataparallel_oracle(mesh):
    cfg = _cfg(stacks=2, feats=32)
    tcfg = _cfg(stacks=2, feats=64)
    student = get_pose_net(cfg, dtype=jnp.float32)
    teacher = get_pose_net(tcfg, dtype=jnp.float32)
    state0 = create_train_state(cfg, student, jax.random.PRNGKey(1),
                                jnp.zeros((1, HW, HW, 3)))
    tvars = teacher.init(jax.random.PRNGKey(2), jnp.zeros((1, HW, HW, 3)),
                         train=False)
    step = make_fpd_train_step(student, teacher, cfg, mesh,
                               is_multi_output(student),
                               is_multi_output(teacher), bn_stats="device0")

    rng = np.random.RandomState(11)
    state_spmd = _fresh(state0)
    for i in range(2):
        batch = _batch(rng)
        pre = _fresh(state_spmd)
        state_spmd, metrics = step(state_spmd, _fresh(tvars),
                                   shard_batch(mesh, batch))
        state_orc, loss_orc = _dp_oracle_step(
            state=pre, model=student, batch=batch,
            multi_output=is_multi_output(student), bn_stats="device0",
            teacher=teacher, tvars=tvars, t_multi=is_multi_output(teacher),
            alpha=float(cfg.KD.ALPHA))
        np.testing.assert_allclose(float(metrics["loss"]), loss_orc,
                                   rtol=1e-3, err_msg=f"step {i}")
        _assert_trees_close(state_spmd.params, state_orc.params)
        _assert_trees_close(state_spmd.batch_stats, state_orc.batch_stats)


def test_global_batch_split_changes_bn_but_not_grad_mean(mesh):
    """Sanity on the oracle itself: with BN in train mode, per-shard stats
    genuinely differ from full-batch stats — i.e. the oracle is testing
    DataParallel semantics, not trivially equal to a full-batch step."""
    cfg = _cfg()
    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, HW, HW, 3)))
    batch = _batch(np.random.RandomState(3))

    # full-batch stats
    _, mutated = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["image"]), train=True, mutable=["batch_stats"])
    full = mutated["batch_stats"]
    # shard-0 stats
    _, mutated0 = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(batch["image"][:B // NDEV]), train=True,
        mutable=["batch_stats"])
    shard0 = mutated0["batch_stats"]

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), full, shard0)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-4
