"""Loss / decode / PCK parity tests.

Oracles are per-joint-loop numpy reimplementations of the reference's torch
code (loss.py:28-39, loss.py:49-84, inference.py:18-79, evaluate.py:16-71);
the fused JAX versions must match them elementwise.
"""

import numpy as np
import jax.numpy as jnp

from fhpe_tpu.train.loss import (
    fpd_loss,
    joints_mse_loss,
    joints_ohkm_mse_loss,
    stacked_mse_loss,
)
from fhpe_tpu.ops.decode import (
    decode_heatmaps_jax,
    get_final_preds,
    get_max_preds,
    get_max_preds_jax,
    make_inverse_transforms,
    quarter_offset_jax,
    post_process_quarter_offset,
)
from fhpe_tpu.eval.pck import accuracy_jax, accuracy_np



def _ref_mse(output, target, weight=None):
    """Reference JointsMSELoss as a numpy loop (NCHW (B,J,H,W))."""
    b, j = output.shape[:2]
    pred = output.reshape(b, j, -1)
    gt = target.reshape(b, j, -1)
    loss = 0.0
    for idx in range(j):
        p, g = pred[:, idx], gt[:, idx]
        if weight is not None:
            w = weight[:, idx:idx + 1]
            p, g = p * w, g * w
        loss += 0.5 * np.mean((p - g) ** 2)
    return loss / j


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def test_mse_loss_matches_reference():
    rng = np.random.RandomState(10)
    out = rng.randn(4, 16, 16, 8).astype(np.float32)   # NHWC
    tgt = rng.randn(4, 16, 16, 8).astype(np.float32)
    w = (rng.rand(4, 8) > 0.3).astype(np.float32)
    ours = float(joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w)))
    ref = _ref_mse(_nchw(out), _nchw(tgt), w)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # unweighted
    ours = float(joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt)))
    np.testing.assert_allclose(ours, _ref_mse(_nchw(out), _nchw(tgt)), rtol=1e-5)


def test_stacked_mse_sums_stacks():
    rng = np.random.RandomState(11)
    out = rng.randn(3, 2, 8, 8, 4).astype(np.float32)  # (S, B, H, W, J)
    tgt = rng.randn(2, 8, 8, 4).astype(np.float32)
    w = np.ones((2, 4), np.float32)
    total = float(stacked_mse_loss(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(w)))
    ref = sum(_ref_mse(_nchw(out[s]), _nchw(tgt), w) for s in range(3))
    np.testing.assert_allclose(total, ref, rtol=1e-5)


def test_ohkm_loss_matches_reference():
    rng = np.random.RandomState(12)
    out = rng.randn(4, 8, 8, 16).astype(np.float32)
    tgt = rng.randn(4, 8, 8, 16).astype(np.float32)
    w = (rng.rand(4, 16) > 0.2).astype(np.float32)
    topk = 8
    # reference: per-sample top-k of per-joint mean losses (loss.py:49-59)
    o, t = _nchw(out), _nchw(tgt)
    per = np.zeros((4, 16))
    for j in range(16):
        p = o[:, j].reshape(4, -1) * w[:, j:j + 1]
        g = t[:, j].reshape(4, -1) * w[:, j:j + 1]
        per[:, j] = 0.5 * np.mean((p - g) ** 2, axis=1)
    ref = np.mean([np.sort(per[i])[-topk:].sum() / topk for i in range(4)])
    ours = float(joints_ohkm_mse_loss(jnp.asarray(out), jnp.asarray(tgt),
                                      jnp.asarray(w), topk))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_fpd_loss_mixing():
    rng = np.random.RandomState(13)
    s_out = rng.randn(2, 3, 8, 8, 4).astype(np.float32)  # stacks=2
    teacher = rng.randn(3, 8, 8, 4).astype(np.float32)
    tgt = rng.randn(3, 8, 8, 4).astype(np.float32)
    w = np.ones((3, 4), np.float32)
    alpha = 0.3
    total, pose, kd = fpd_loss(jnp.asarray(s_out), jnp.asarray(teacher),
                               jnp.asarray(tgt), jnp.asarray(w), alpha)
    ref_pose = sum(_ref_mse(_nchw(s_out[s]), _nchw(tgt), w) for s in range(2))
    ref_kd = sum(_ref_mse(_nchw(s_out[s]), _nchw(teacher), w) for s in range(2))
    np.testing.assert_allclose(float(pose), ref_pose, rtol=1e-5)
    np.testing.assert_allclose(float(kd), ref_kd, rtol=1e-5)
    np.testing.assert_allclose(float(total),
                               (1 - alpha) * ref_pose + alpha * ref_kd, rtol=1e-5)


def _random_heatmaps(rng, b=3, j=5, h=16, w=12, ties=True):
    hm = rng.randn(b, j, h, w).astype(np.float32)
    if ties:
        hm[0, 0] = 0.0          # all-equal: argmax -> first index
        hm[1, 1] = -np.abs(hm[1, 1])  # all negative max <= 0 -> masked
        hm[1, 1].flat[0] = 0.0
    return hm


def test_get_max_preds_parity():
    hm = _random_heatmaps(np.random.RandomState(14))
    ref_p, ref_v = get_max_preds(hm)
    j_p, j_v = get_max_preds_jax(jnp.asarray(np.transpose(hm, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(j_p), ref_p[:, :, :2], atol=0)
    np.testing.assert_allclose(np.asarray(j_v), ref_v[..., 0], atol=0)


def test_quarter_offset_parity():
    hm = _random_heatmaps(np.random.RandomState(15), ties=False)
    coords, _ = get_max_preds(hm)
    ref = post_process_quarter_offset(coords, hm)
    nhwc = jnp.asarray(np.transpose(hm, (0, 2, 3, 1)))
    ours = quarter_offset_jax(jnp.asarray(coords[:, :, :2]), nhwc)
    np.testing.assert_allclose(np.asarray(ours), ref[:, :, :2], atol=1e-6)


def test_full_decode_parity():
    rng = np.random.RandomState(16)
    hm = _random_heatmaps(rng, b=4, j=16, h=64, w=64, ties=False)
    centers = rng.uniform(100, 400, size=(4, 2))
    scales = rng.uniform(0.8, 2.0, size=(4, 2))
    ref_preds, ref_vals = get_final_preds(hm, centers, scales, post_process=True)

    inv = make_inverse_transforms(centers, scales, (64, 64))
    nhwc = jnp.asarray(np.transpose(hm, (0, 2, 3, 1)))
    j_preds, j_vals = decode_heatmaps_jax(nhwc, jnp.asarray(inv), post_process=True)
    np.testing.assert_allclose(np.asarray(j_preds), ref_preds[:, :, :2],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_vals), ref_vals[..., 0], atol=0)


def test_accuracy_parity():
    rng = np.random.RandomState(17)
    out = _random_heatmaps(rng, b=6, j=16, h=64, w=64, ties=False)
    # make gt a gaussian-ish field with known peaks incl. edge cases
    gt = np.zeros_like(out)
    for n in range(6):
        for c in range(16):
            y, x = rng.randint(0, 64), rng.randint(0, 64)
            gt[n, c, y, x] = 1.0
    gt[0, 0] = 0  # invalid joint (decodes to (0,0) -> ignored)
    acc, avg, cnt, _ = accuracy_np(out, gt)
    pj, javg, jcnt = accuracy_jax(
        jnp.asarray(np.transpose(out, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(gt, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(pj), acc[1:], atol=1e-6)
    np.testing.assert_allclose(float(javg), avg, atol=1e-6)
    assert int(jcnt) == cnt
