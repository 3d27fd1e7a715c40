"""Golden parity: our MPII PCKh evaluator vs the reference's, executed.

Runs the ACTUAL reference ``MPIIDataset.evaluate`` (lib/dataset/mpii.py:
109-194 — it never touches ``self``, so it is called unbound) and our
restyled ``fhpe_tpu.data.mpii.evaluate`` on the same synthetic gt_*.mat +
random predictions, and requires bit-identical metric dicts.  This pins
the one near-transcription block in the repo (the PCKh protocol is a fixed
published metric where bit-identity IS the requirement) against drift.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_oracle

reference_oracle.install()

from fhpe_tpu.data import mpii as our_mpii
from fhpe_tpu.data.synthetic import make_synthetic_mpii


def _cfg(root):
    return SimpleNamespace(DATASET=SimpleNamespace(ROOT=str(root),
                                                   TEST_SET="valid"))


def _ref_evaluate(cfg, preds, output_dir):
    from dataset.mpii import MPIIDataset

    # evaluate() reads only cfg/preds/output_dir — no dataset state
    return MPIIDataset.evaluate(None, cfg, preds, output_dir)


@pytest.mark.parametrize("noise", [2.0, 18.0, 60.0])
def test_pckh_golden_parity(tmp_path, noise):
    root = tmp_path / "mpii"
    make_synthetic_mpii(str(root), image_set="valid", num_images=24,
                        image_hw=(160, 160), seed=3)
    from scipy.io import loadmat

    gt = loadmat(os.path.join(root, "annot", "gt_valid.mat"))
    gt_xy = np.transpose(gt["pos_gt_src"], (2, 0, 1))  # (N, J, 2) 1-based

    rs = np.random.RandomState(int(noise))
    preds = gt_xy - 1.0 + rs.randn(*gt_xy.shape) * noise
    # a few missing-prediction rows exercise the visibility masking
    preds[::7] += 500.0

    cfg = _cfg(root)
    ref_dir = tmp_path / "ref_out"
    our_dir = tmp_path / "our_out"
    ref_dir.mkdir()
    our_dir.mkdir()
    ref_nv, ref_perf = _ref_evaluate(cfg, preds.copy(), str(ref_dir))
    our_nv, our_perf = our_mpii.evaluate(cfg, preds.copy(), str(our_dir))

    assert list(our_nv.keys()) == list(ref_nv.keys())
    for k in ref_nv:
        assert float(our_nv[k]) == float(ref_nv[k]), (
            f"{k}: ours {our_nv[k]!r} != ref {ref_nv[k]!r}")
    assert float(our_perf) == float(ref_perf)
    # sanity: the mid-noise case must be a non-degenerate score
    if noise == 18.0:
        assert 0.0 < float(our_perf) < 100.0

    # pred.mat side effect matches too
    ours_mat = loadmat(str(our_dir / "pred.mat"))["preds"]
    ref_mat = loadmat(str(ref_dir / "pred.mat"))["preds"]
    np.testing.assert_array_equal(ours_mat, ref_mat)


def test_pckh_test_set_short_circuit(tmp_path):
    cfg = SimpleNamespace(DATASET=SimpleNamespace(ROOT=str(tmp_path),
                                                  TEST_SET="test"))
    nv, perf = our_mpii.evaluate(cfg, np.zeros((2, 16, 2)), None)
    assert list(nv.items()) == [("Null", 0.0)] and perf == 0.0
