"""validate()'s TensorBoard surface (reference function.py:304-330):
valid_loss / valid_acc scalars, the name_values add_scalars dict, and the
DEBUG-gated image grids logged as TB images."""

import numpy as np

import jax
import jax.numpy as jnp

from fhpe_tpu.cli.common import build_loaders, validate
from fhpe_tpu.config import get_default_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net, is_multi_output
from fhpe_tpu.parallel.mesh import get_mesh
from fhpe_tpu.train.state import create_train_state


class RecordingWriter:
    def __init__(self):
        self.scalars = {}
        self.scalar_dicts = {}
        self.images = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = (float(value), step)

    def add_scalars(self, tag, values, step):
        self.scalar_dicts[tag] = (dict(values), step)

    def add_image(self, tag, img, step, dataformats="CHW"):
        self.images[tag] = (np.asarray(img), dataformats, step)


def test_validate_tb_surface(tmp_path):
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
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.TEST.FLIP_TEST = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DEBUG.DEBUG = True
    cfg.DEBUG.SAVE_BATCH_IMAGES_GT = True
    cfg.DEBUG.SAVE_HEATMAPS_PRED = True

    mesh = get_mesh(8)
    model = get_pose_net(cfg, dtype=jnp.float32)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, val_loader, meta = build_loaders(cfg, 8, train=False)

    writer = RecordingWriter()
    perf, *_ = validate(cfg, model, variables, val_loader, mesh, meta, None,
                        is_multi_output(model), None, str(tmp_path),
                        writer=writer, global_step=7)

    assert writer.scalars["valid_loss"][1] == 7
    assert writer.scalars["valid_acc"][0] >= 0.0
    # DEBUG-gated grids land in TB as HWC RGB uint8
    for tag in ("valid_gt", "valid_hm_pred"):
        img, fmt, step = writer.images[tag]
        assert fmt == "HWC" and img.dtype == np.uint8 and step == 7
        assert img.ndim == 3 and img.shape[2] == 3
    assert "valid_hm_gt" not in writer.images  # knob off

    # evaluate_fn=None (synthetic): no name_values dict to add_scalars
    assert writer.scalar_dicts == {}
