"""validate() must be invariant to TEST batch size (tail-padding
correctness at the integration level): metrics and predictions from
batch sizes that do / don't divide the dataset must agree exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.cli.common import build_loaders, validate
from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.parallel.mesh import get_mesh
from fhpe_tpu.train.state import create_train_state


def _cfg(tmp_path, test_bs):
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.NUM_JOINTS = 16
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    cfg.MODEL.EXTRA.NUM_STACKS = 1
    cfg.MODEL.EXTRA.NUM_FEATURES = 64
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.ROOT = str(tmp_path / "data")
    cfg.TEST.BATCH_SIZE_PER_GPU = test_bs
    cfg.TEST.FLIP_TEST = True
    cfg.TEST.POST_PROCESS = True
    cfg.TEST.SHIFT_HEATMAP = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_validate_batch_size_invariance(tmp_path):
    mesh = get_mesh(8)

    results = {}
    variables = None
    for bs in (4, 3):  # 8*4=32 divides the 32-sample val set; 8*3=24 doesn't
        cfg = _cfg(tmp_path, bs)
        model = get_pose_net(cfg, dtype=jnp.float32)
        if variables is None:
            state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 64, 64, 3)))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        _, val_loader, meta = build_loaders(cfg, 8, train=False)
        perf, _, preds, boxes, paths = validate(
            cfg, model, variables, val_loader, mesh, meta, None,
            is_multi_output(model), None, "")
        results[bs] = (perf, preds, boxes, paths)

    perf_a, preds_a, boxes_a, paths_a = results[4]
    perf_b, preds_b, boxes_b, paths_b = results[3]
    assert paths_a == paths_b
    np.testing.assert_allclose(preds_a, preds_b, atol=1e-4)
    np.testing.assert_allclose(boxes_a, boxes_b, atol=1e-6)
    assert perf_a == pytest.approx(perf_b, abs=1e-6)
