"""Trajectory equivalence against the ACTUAL torch reference training loop.

Same init + same batch stream through the reference's ``train()`` /
``fpd_train()`` (``lib/core/function.py:28-187``, real torch on CPU) and
through this package's jitted SPMD steps must produce the same per-step
loss curve, the same effective LR sequence, the same final weights, and
the same BatchNorm running statistics.

This is the correctness class no per-component oracle test can catch:
optimizer semantics (optax adam vs torch Adam bias correction/eps
placement), BN running-stat update order and Bessel correction, the
MultiStepLR step-at-top-of-epoch off-by-one (``tools/train.py:209-210``),
and multi-output loss stacking are exercised JOINTLY across optimizer
steps crossing an LR milestone.

Precision design (measured on this rig, see docs/PARITY.md):

* Both sides run in FLOAT64 (torch ``model.double()``; jax under
  ``jax.enable_x64``).  In float32 the comparison is chaotic by
  construction: the hourglass's BN-absorbed conv biases have analytically
  zero gradients, so both frameworks compute pure rounding noise for
  them, and Adam's first-step ``g/(sqrt(g^2)+eps)`` turns each into a
  +-lr coin flip.
* Even in float64 the dynamics are CHAOTIC: per-step reduction-order
  rounding (~1e-15 relative) is amplified ~30-100x per Adam step (the
  update Jacobian carries lr/sqrt(v_hat) factors that are huge early in
  training).  Measured envelope: 1e-15 at step 0 -> ~4e-3 by step 7 at
  lr 2.5e-3 — with NO semantic difference.  Two different-BLAS torch
  builds would diverge the same way.

So the assertions split by horizon:
* SHORT tests (4 steps, LR milestone in the middle): loss curve to 1e-8
  relative, final weights + BN running stats to tight atol — any semantic
  mismatch shows at >=1e-4 on step 1.
* A LONG envelope test (18 steps, 3 epochs): per-step deviation must stay
  inside the measured chaos envelope, which still catches gross mid-run
  bugs (e.g. the wrong-milestone LR would blow the epoch-2 tier).

The torch reference modules are executed purely as an oracle; none of
their code is part of the package.
"""

import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import serialization, traverse_util

import reference_oracle

reference_oracle.install()

from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net
from fhpe_tpu.parallel.mesh import get_mesh, shard_batch
from fhpe_tpu.train.state import create_train_state, lr_for_epoch, set_lr
from fhpe_tpu.train.step import make_fpd_train_step, make_train_step
from fhpe_tpu.utils.torch_import import import_for_model

B = 4            # batch size (reference MPII default is 4/GPU)
IMG = 64
HM = 16
J = 8
LR = 2.5e-3      # large enough that a broken update rule visibly diverges
LR_FACTOR = 0.1

# SHORT runs: 2 epochs x 2 steps, milestone at epoch 2 -> effective LR
# drop at trained epoch 1 (the reference's historic off-by-one).
SHORT = dict(epochs=2, steps=2, lr_step=[2])
# LONG run: 3 epochs x 6 steps, same milestone.
LONG = dict(epochs=3, steps=6, lr_step=[2])

LOSS_RTOL_SHORT = 1e-8
# dead-bias lr*g/eps drift accumulates ~3e-8 over 4 steps and leaks into
# the BN batch means; semantic bugs (missing Bessel correction ~1e-3
# relative on var, wrong momentum O(1)) land orders of magnitude above
PARAM_ATOL = 1e-6
STAT_ATOL = 1e-6
# measured chaos envelope (see module docstring) with ~100x headroom at
# the front (semantic bugs land at >=1e-4 from step 1) and ~4x at the tail
LONG_ENVELOPE = [(3, 1e-8), (6, 1e-3), (18, 0.15)]


class _Recorder(torch.nn.Module):
    """Wraps a reference criterion, recording every call's scalar value."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.calls = []

    def forward(self, output, target, target_weight):
        out = self.inner(output, target, target_weight)
        self.calls.append(float(out.detach()))
        return out


class _Writer:
    def add_scalar(self, *a, **k):
        pass


def _ref_loop_cfg():
    return SimpleNamespace(
        PRINT_FREQ=10 ** 9,
        DEBUG=SimpleNamespace(DEBUG=False),
        KD=SimpleNamespace(ALPHA=0.5),
    )


def _make_batches(n_steps, seed):
    """Deterministic NCHW torch-layout batch stream shared by both sides."""
    rs = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        img = rs.randn(B, 3, IMG, IMG).astype(np.float64)
        tgt = (rs.rand(B, J, HM, HM) ** 4).astype(np.float64)
        tw = (rs.rand(B, J) > 0.25).astype(np.float64).reshape(B, J, 1)
        batches.append((img, tgt, tw))
    return batches


def _torch_loader(batches):
    return [(torch.from_numpy(i), torch.from_numpy(t), torch.from_numpy(w),
             {}) for i, t, w in batches]


def _sd_numpy(model):
    # .copy(): torch trains these tensors IN PLACE and .numpy() shares
    # memory — without it the "initial" snapshot silently tracks training
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


def _group_sums(calls, group):
    """Reference multi-output loss = sum of per-stack criterion calls."""
    assert len(calls) % group == 0
    a = np.asarray(calls, np.float64).reshape(-1, group)
    return a.sum(axis=1)


@pytest.fixture()
def cpu_cuda_patch(monkeypatch):
    """The reference loop calls .cuda() on targets; run it on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


def _run_reference_train(ref_model, batches, sched):
    """Drive lib/core/function.py train() exactly as tools/train.py does
    (optimizer utils.py:59-75, scheduler + step-at-top train.py:204-215)."""
    import core.function as ref_fn
    from core.loss import JointsMSELoss

    crit = _Recorder(JointsMSELoss(use_target_weight=True))
    opt = torch.optim.Adam(ref_model.parameters(), lr=LR)
    sch = torch.optim.lr_scheduler.MultiStepLR(opt, sched["lr_step"],
                                               LR_FACTOR)
    writer_dict = {"writer": _Writer(), "train_global_steps": 0}
    lrs = []
    steps = sched["steps"]
    for epoch in range(sched["epochs"]):
        sch.step()
        lrs.append(opt.param_groups[0]["lr"])
        loader = _torch_loader(batches[epoch * steps:(epoch + 1) * steps])
        ref_fn.train(_ref_loop_cfg(), loader, ref_model, crit, opt, epoch,
                     "/tmp", "", writer_dict)
    return crit.calls, lrs


def _run_reference_fpd(ref_model, ref_teacher, batches, sched):
    import core.function as ref_fn
    from core.loss import JointsMSELoss

    pose_crit = _Recorder(JointsMSELoss(use_target_weight=True))
    kd_crit = _Recorder(JointsMSELoss(use_target_weight=True))
    opt = torch.optim.Adam(ref_model.parameters(), lr=LR)
    sch = torch.optim.lr_scheduler.MultiStepLR(opt, sched["lr_step"],
                                               LR_FACTOR)
    writer_dict = {"writer": _Writer(), "train_global_steps": 0}
    lrs = []
    steps = sched["steps"]
    for epoch in range(sched["epochs"]):
        sch.step()
        lrs.append(opt.param_groups[0]["lr"])
        loader = _torch_loader(batches[epoch * steps:(epoch + 1) * steps])
        ref_fn.fpd_train(_ref_loop_cfg(), loader, ref_model, ref_teacher,
                         pose_crit, kd_crit, opt, epoch, "/tmp", "",
                         writer_dict)
    return pose_crit.calls, kd_crit.calls, lrs


def _our_cfg(name, extra_updates, sched):
    cfg = get_default_config()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_JOINTS = J
    cfg.MODEL.IMAGE_SIZE = [IMG, IMG]
    cfg.MODEL.HEATMAP_SIZE = [HM, HM]
    cfg.MODEL.EXTRA = MODEL_EXTRAS[name]()
    for k, v in extra_updates.items():
        setattr(cfg.MODEL.EXTRA, k, v)
    cfg.LOSS.USE_TARGET_WEIGHT = True
    cfg.TRAIN.OPTIMIZER = "adam"
    cfg.TRAIN.LR = LR
    cfg.TRAIN.LR_STEP = sched["lr_step"]
    cfg.TRAIN.LR_FACTOR = LR_FACTOR
    cfg.KD.ALPHA = 0.5
    return cfg


def _state_from_torch(cfg, model, sd0):
    sample = jnp.zeros((1, IMG, IMG, 3))
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
    imported = import_for_model(cfg, sd0)
    variables = serialization.from_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats}, imported)
    return state.replace(params=variables["params"],
                         batch_stats=variables["batch_stats"],
                         opt_state=state.tx.init(variables["params"]))


def _jax_batch(mesh, img, tgt, tw):
    return shard_batch(mesh, {
        "image": jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
        "target": jnp.asarray(np.transpose(tgt, (0, 2, 3, 1))),
        "target_weight": jnp.asarray(tw[..., 0]),
    })


def _run_ours(cfg, model, sd0, batches, sched, multi, teacher=None,
              tsd=None, tmulti=False, tcfg=None):
    with jax.enable_x64(True):
        return _run_ours_x64(cfg, model, sd0, batches, sched, multi,
                             teacher, tsd, tmulti, tcfg)


def _run_ours_x64(cfg, model, sd0, batches, sched, multi, teacher, tsd,
                  tmulti, tcfg):
    mesh = get_mesh(1)
    state = _state_from_torch(cfg, model, sd0)
    if teacher is None:
        step = make_train_step(model, cfg, mesh, multi_output=multi)
        args = ()
    else:
        sample = jnp.zeros((1, IMG, IMG, 3))
        tinit = teacher.init(jax.random.PRNGKey(1), sample, train=False)
        timported = import_for_model(tcfg, tsd)
        tvars = serialization.from_state_dict(tinit, timported)
        step = make_fpd_train_step(model, teacher, cfg, mesh,
                                   multi_output=multi,
                                   teacher_multi_output=tmulti,
                                   teacher_cfg=tcfg)
        args = (tvars,)
    losses, poses, kds, lrs = [], [], [], []
    steps = sched["steps"]
    for epoch in range(sched["epochs"]):
        lr = lr_for_epoch(cfg, epoch)
        lrs.append(lr)
        state = set_lr(state, lr)
        for img, tgt, tw in batches[epoch * steps:(epoch + 1) * steps]:
            state, m = step(state, *args, _jax_batch(mesh, img, tgt, tw))
            losses.append(float(m["loss"]))
            if teacher is not None:
                poses.append(float(m["pose_loss"]))
                kds.append(float(m["kd_loss"]))
    return state, losses, poses, kds, lrs


def _compare_trees(ours, theirs, atol, what):
    flat_o = traverse_util.flatten_dict(
        serialization.to_state_dict(ours), sep="/")
    flat_t = traverse_util.flatten_dict(theirs, sep="/")
    assert set(flat_o) == set(flat_t), (
        f"{what}: tree mismatch {set(flat_o) ^ set(flat_t)}")
    worst = 0.0
    worst_key = None
    for k, v in flat_t.items():
        d = float(np.max(np.abs(np.asarray(flat_o[k]) - np.asarray(v))))
        if d > worst:
            worst, worst_key = d, k
    print(f"{what}: max abs diff {worst:.3e} at {worst_key}")
    assert worst < atol, f"{what}: {worst:.3e} at {worst_key} (atol {atol})"


def _rel_dev(ours, theirs):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    return np.abs(ours - theirs) / (np.abs(theirs) + 1e-12)


def _assert_curves_tight(ours, theirs, what, rtol=LOSS_RTOL_SHORT):
    rel = _rel_dev(ours, theirs)
    print(f"{what}: max rel dev {rel.max():.3e} at step {rel.argmax()}")
    assert rel.max() < rtol, (
        f"{what} diverged: max rel dev {rel.max():.3e}\n"
        f"ours:   {np.asarray(ours)}\ntheirs: {np.asarray(theirs)}")


def _assert_curves_envelope(ours, theirs, what):
    rel = _rel_dev(ours, theirs)
    print(f"{what}: per-step rel dev "
          + " ".join(f"{d:.1e}" for d in rel))
    lo = 0
    for hi, tol in LONG_ENVELOPE:
        seg = rel[lo:hi]
        assert seg.max() < tol, (
            f"{what}: steps [{lo},{hi}) rel dev {seg.max():.3e} "
            f"outside chaos envelope {tol}")
        lo = hi


def _hourglass_pair(stacks, feats, seed, sched):
    import models.hourglass as ref_hg

    rcfg = SimpleNamespace(MODEL=SimpleNamespace(
        EXTRA=SimpleNamespace(NUM_FEATURES=feats, NUM_STACKS=stacks,
                              NUM_BLOCKS=1),
        NUM_JOINTS=J))
    torch.manual_seed(seed)
    ref_model = ref_hg.get_pose_net(rcfg, is_train=True).double()
    cfg = _our_cfg("hourglass",
                   {"NUM_STACKS": stacks, "NUM_FEATURES": feats}, sched)
    model = get_pose_net(cfg, dtype=jnp.float64)
    return ref_model, cfg, model


def _resnet18_pair(seed, sched):
    import models.pose_resnet as ref_rn

    class DCfg(dict):
        __getattr__ = dict.__getitem__

    def wrap(d):
        return (DCfg({k: wrap(v) for k, v in d.items()})
                if isinstance(d, dict) else d)

    rcfg = wrap({"MODEL": {"EXTRA": {
        "NUM_LAYERS": 18, "DECONV_WITH_BIAS": False, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [32, 32, 32], "NUM_DECONV_KERNELS": [4, 4, 4],
        "FINAL_CONV_KERNEL": 1}, "NUM_JOINTS": J, "INIT_WEIGHTS": False,
        "PRETRAINED": ""}})
    torch.manual_seed(seed)
    ref_model = ref_rn.get_pose_net(rcfg, is_train=False).double()  # no re-init
    cfg = _our_cfg("pose_resnet", {"NUM_LAYERS": 18,
                                   "NUM_DECONV_FILTERS": [32, 32, 32]}, sched)
    model = get_pose_net(cfg, dtype=jnp.float64)
    return ref_model, cfg, model


@pytest.mark.slow
def test_short_trajectory_hourglass(cpu_cuda_patch):
    """Multi-output (2-stack) hourglass, 4 steps over an LR milestone:
    tight loss-curve, final-weight, and BN-running-stat parity."""
    stacks = 2
    sched = SHORT
    ref_model, cfg, model = _hourglass_pair(stacks, 16, 0, sched)
    sd0 = _sd_numpy(ref_model)
    batches = _make_batches(sched["epochs"] * sched["steps"], seed=10)

    ref_calls, ref_lrs = _run_reference_train(ref_model, batches, sched)
    ref_losses = _group_sums(ref_calls, stacks)

    state, losses, _, _, lrs = _run_ours(cfg, model, sd0, batches, sched,
                                         multi=True)

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-12, err_msg=(
        "effective LR schedule diverged from the reference MultiStepLR"))
    _assert_curves_tight(losses, ref_losses, "hourglass short train loss")

    final = import_for_model(cfg, _sd_numpy(ref_model))
    _compare_trees(state.params, final["params"], PARAM_ATOL,
                   "hourglass final params")
    _compare_trees(state.batch_stats, final["batch_stats"], STAT_ATOL,
                   "hourglass final BN stats")


@pytest.mark.slow
def test_short_trajectory_resnet18(cpu_cuda_patch):
    """Single-output post-act arch: stride convs, deconvs, downsample BN."""
    sched = SHORT
    ref_model, cfg, model = _resnet18_pair(1, sched)
    sd0 = _sd_numpy(ref_model)
    batches = _make_batches(sched["epochs"] * sched["steps"], seed=11)

    ref_calls, ref_lrs = _run_reference_train(ref_model, batches, sched)

    state, losses, _, _, lrs = _run_ours(cfg, model, sd0, batches, sched,
                                         multi=False)

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-12)
    _assert_curves_tight(losses, ref_calls, "resnet18 short train loss")

    final = import_for_model(cfg, _sd_numpy(ref_model))
    _compare_trees(state.params, final["params"], PARAM_ATOL,
                   "resnet18 final params")
    _compare_trees(state.batch_stats, final["batch_stats"], STAT_ATOL,
                   "resnet18 final BN stats")


@pytest.mark.slow
def test_short_fpd_trajectory_hourglass(cpu_cuda_patch):
    """fpd_train() segment: teacher eval-mode forward + (1-a)pose + a*kd.

    Covers function.py:99-187 jointly: the teacher's non-detached forward
    (gradient-free w.r.t. the optimizer either way), per-stack pose/kd
    sums, and the alpha mixing.
    """
    stacks = 2
    sched = SHORT
    ref_student, cfg, student = _hourglass_pair(stacks, 16, 2, sched)
    ref_teacher, tcfg, teacher = _hourglass_pair(1, 24, 3, sched)
    sd0 = _sd_numpy(ref_student)
    tsd = _sd_numpy(ref_teacher)
    batches = _make_batches(sched["epochs"] * sched["steps"], seed=12)

    pose_calls, kd_calls, ref_lrs = _run_reference_fpd(
        ref_student, ref_teacher, batches, sched)
    ref_pose = _group_sums(pose_calls, stacks)
    ref_kd = _group_sums(kd_calls, stacks)
    alpha = 0.5
    ref_total = (1 - alpha) * ref_pose + alpha * ref_kd

    state, losses, poses, kds, lrs = _run_ours(
        cfg, student, sd0, batches, sched, multi=True,
        teacher=teacher, tsd=tsd, tmulti=True, tcfg=tcfg)

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-12)
    _assert_curves_tight(poses, ref_pose, "fpd pose loss")
    _assert_curves_tight(kds, ref_kd, "fpd kd loss")
    _assert_curves_tight(losses, ref_total, "fpd total loss")

    final = import_for_model(cfg, _sd_numpy(ref_student))
    _compare_trees(state.params, final["params"], PARAM_ATOL,
                   "fpd final student params")
    _compare_trees(state.batch_stats, final["batch_stats"], STAT_ATOL,
                   "fpd final student BN stats")


@pytest.mark.slow
def test_long_trajectory_envelope_hourglass(cpu_cuda_patch):
    """18 steps / 3 epochs: deviation must stay inside the measured chaos
    envelope.  Catches gross mid-run divergence (a wrong LR milestone
    takes the epoch-2 tier out by orders of magnitude) while tolerating
    the inherent Adam rounding-chaos growth."""
    stacks = 2
    sched = LONG
    ref_model, cfg, model = _hourglass_pair(stacks, 16, 4, sched)
    sd0 = _sd_numpy(ref_model)
    batches = _make_batches(sched["epochs"] * sched["steps"], seed=13)

    ref_calls, ref_lrs = _run_reference_train(ref_model, batches, sched)
    ref_losses = _group_sums(ref_calls, stacks)

    _, losses, _, _, lrs = _run_ours(cfg, model, sd0, batches, sched,
                                     multi=True)

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-12)
    _assert_curves_envelope(losses, ref_losses, "hourglass long train loss")


def _hrnet_tiny_pair(seed, sched):
    """Tiny 3-stage HRNet (2/3-branch, 1 block, 8-32ch): exercises the
    transition layers, fuse up/down paths, and multi_scale_output=False."""
    import models.pose_hrnet as ref_hr

    class DCfg(dict):
        __getattr__ = dict.__getitem__

    def wrap(d):
        return (DCfg({k: wrap(v) for k, v in d.items()})
                if isinstance(d, dict) else d)

    stages = {
        "STAGE2": dict(NUM_MODULES=1, NUM_BRANCHES=2, NUM_BLOCKS=[1, 1],
                       NUM_CHANNELS=[8, 16], BLOCK="BASIC",
                       FUSE_METHOD="SUM"),
        "STAGE3": dict(NUM_MODULES=1, NUM_BRANCHES=3, NUM_BLOCKS=[1, 1, 1],
                       NUM_CHANNELS=[8, 16, 32], BLOCK="BASIC",
                       FUSE_METHOD="SUM"),
        "STAGE4": dict(NUM_MODULES=1, NUM_BRANCHES=4,
                       NUM_BLOCKS=[1, 1, 1, 1],
                       NUM_CHANNELS=[8, 16, 32, 64], BLOCK="BASIC",
                       FUSE_METHOD="SUM"),
    }
    rcfg = wrap({"MODEL": {"EXTRA": dict(FINAL_CONV_KERNEL=1,
                                         PRETRAINED_LAYERS=["*"], **stages),
                           "NUM_JOINTS": J}})
    torch.manual_seed(seed)
    ref_model = ref_hr.PoseHighResolutionNet(rcfg).double()

    cfg = _our_cfg("pose_hrnet", {}, sched)
    cfg.MODEL.EXTRA.FINAL_CONV_KERNEL = 1
    for name, s in stages.items():
        node = cfg.MODEL.EXTRA[name]
        for k, v in s.items():
            setattr(node, k, v)
    model = get_pose_net(cfg, dtype=jnp.float64)
    return ref_model, cfg, model


@pytest.mark.slow
def test_short_trajectory_hrnet(cpu_cuda_patch):
    """Tiny HRNet, 4 steps over an LR milestone: the COCO flagship family's
    transition/fuse/upsample paths under joint optimizer+BN dynamics."""
    sched = SHORT
    ref_model, cfg, model = _hrnet_tiny_pair(5, sched)
    sd0 = _sd_numpy(ref_model)
    batches = _make_batches(sched["epochs"] * sched["steps"], seed=14)

    ref_calls, ref_lrs = _run_reference_train(ref_model, batches, sched)

    state, losses, _, _, lrs = _run_ours(cfg, model, sd0, batches, sched,
                                         multi=False)

    np.testing.assert_allclose(lrs, ref_lrs, rtol=1e-12)
    _assert_curves_tight(losses, ref_calls, "hrnet short train loss")

    final = import_for_model(cfg, _sd_numpy(ref_model))
    _compare_trees(state.params, final["params"], PARAM_ATOL,
                   "hrnet final params")
    _compare_trees(state.batch_stats, final["batch_stats"], STAT_ATOL,
                   "hrnet final BN stats")
