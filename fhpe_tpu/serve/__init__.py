"""Production serving layer: fixed-shape batched pose inference.

The reference's only inference surface is ``tools/test.py`` — a dataset
evaluation loop (``lib/core/function.py:189-332``); it ships no API for
serving a trained model on arbitrary images.  This package is the
TPU-native serving layer on top of the same compiled forward path the
evaluator uses: one jitted SPMD program per (model, batch-shape), uint8
crops in / (x, y, confidence) keypoints out, with optional flip-test
ensembling (``lib/core/function.py:218-240`` semantics).
"""

from .predictor import Predictor

__all__ = ["Predictor"]
