"""Dtype-flow parity of get_affine_transform with the torch reference.

COCO db records store center/scale as float32 (reference
``lib/dataset/coco.py`` ``_xywh2cs``), so in the reference's
``get_affine_transform`` (``lib/utils/transforms.py:57-89``) the
``scale * 200.0`` product rounds to float32 BEFORE the point
correspondence is built; MPII records are float64 and the same code runs
in float64.  Forcing float64 internally (the pre-fix behavior) shifts the
matrix by ~1e-8 for float32 inputs, which flips isolated warped pixels at
exact bilinear ties — caught live by the COCO readiness gate
(tests/test_real_data_check.py, synthetic sample 3 of 12).

These tests fuzz both dtype regimes directly against the executed
reference function, including rotation (train path) and inv=True (the
prediction back-transform, whose inputs are float32 for COCO in the
reference's validate: torch collation preserves the numpy dtype).
"""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

import reference_oracle

reference_oracle.install()

from utils.transforms import get_affine_transform as ref_gat  # noqa: E402

from fhpe_tpu.geometry.affine import get_affine_transform  # noqa: E402

OUT_SIZE = np.array([192, 256])  # int64, exactly what JointsDataset passes


def _fuzz_cases(dtype, n=200, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        c = rng.uniform(5.0, 600.0, 2).astype(dtype)
        s = rng.uniform(0.3, 4.0, 2).astype(dtype)
        yield c, s


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("rot", [0, 37.5, -180.0])
@pytest.mark.parametrize("inv", [False, True])
def test_matrix_bit_equal_to_reference(dtype, rot, inv):
    for c, s in _fuzz_cases(dtype):
        ours = get_affine_transform(c, s, rot, OUT_SIZE, inv=inv)
        ref = ref_gat(c, s, rot, OUT_SIZE, inv=1 if inv else 0)
        assert np.array_equal(ours, ref), (
            f"dtype={dtype} rot={rot} inv={inv} c={c} s={s}\n"
            f"ours-ref=\n{ours - ref}")


def test_float32_and_float64_differ_at_rounding_level():
    """The two regimes genuinely diverge (so the parametrized test above
    is not vacuous): over the fuzz set, some float32 input must produce a
    (slightly) different matrix than its float64 widening — while staying
    the same transform to float32-rounding relative accuracy."""
    n_diff = 0
    for c, s in _fuzz_cases(np.float64, n=200, seed=1):
        t64 = get_affine_transform(c, s, 0, OUT_SIZE)
        t32 = get_affine_transform(c.astype(np.float32),
                                   s.astype(np.float32), 0, OUT_SIZE)
        assert np.allclose(t32, t64, rtol=1e-5, atol=1e-5)
        if not np.array_equal(t32, t64):
            n_diff += 1
    assert n_diff > 0, "float32 path never diverged — test is vacuous"


def test_scalar_and_list_inputs_promote_like_numpy():
    # scalar scale -> duplicated; list/int inputs run in float64
    t = get_affine_transform([100, 50], 1.5, 0.0, OUT_SIZE)
    t2 = get_affine_transform(np.array([100.0, 50.0]),
                              np.array([1.5, 1.5]), 0.0, OUT_SIZE)
    assert np.array_equal(t, t2)
