"""Model structure tests.

Parameter counts are pinned to the torch reference models (verified equal to
``sum(p.numel())`` over the reference factories; HRNet numbers also match the
published 28.5M / 63.6M, README.md:55-56).  Counts are computed with
``jax.eval_shape`` so no compilation happens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhpe_tpu.config import get_default_config, load_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net, is_multi_output, param_count

W32_YAML = "/root/reference/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml"
W48_YAML = "/root/reference/experiments/coco/hrnet/w48_256x192_adam_lr1e-3.yaml"


def _cfg(name, extra=None, joints=16):
    cfg = get_default_config()
    cfg.MODEL.NAME = name
    cfg.MODEL.NUM_JOINTS = joints
    cfg.MODEL.EXTRA = MODEL_EXTRAS[name]()
    for k, v in (extra or {}).items():
        cfg.MODEL.EXTRA[k] = v
    return cfg


def _count(model, hw=(256, 192)):
    x = jnp.zeros((1, hw[0], hw[1], 3))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    return param_count(shapes["params"])


@pytest.mark.parametrize("stacks,feats,expect", [(4, 128, 3_287_936),
                                                 (8, 256, 25_594_624)])
def test_hourglass_param_count(stacks, feats, expect):
    cfg = _cfg("hourglass", {"NUM_STACKS": stacks, "NUM_FEATURES": feats})
    assert _count(get_pose_net(cfg, dtype=jnp.float32)) == expect


def test_hrnet_param_counts():
    assert _count(get_pose_net(load_config(W32_YAML), jnp.float32)) == 28_536_113
    assert _count(get_pose_net(load_config(W48_YAML), jnp.float32)) == 63_595_745


def test_pose_resnet50_param_count():
    cfg = _cfg("pose_resnet", joints=17)
    assert _count(get_pose_net(cfg, dtype=jnp.float32)) == 33_999_697


def test_hourglass_forward_shapes():
    cfg = _cfg("hourglass", {"NUM_STACKS": 2, "NUM_FEATURES": 128})
    model = get_pose_net(cfg, dtype=jnp.float32)
    assert is_multi_output(model)
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 2, 16, 16, 16)  # (stacks, B, H/4, W/4, J)
    assert out.dtype == jnp.float32
    assert "batch_stats" in v


def test_hrnet_forward_shape():
    model = get_pose_net(load_config(W32_YAML), jnp.float32)
    assert not is_multi_output(model)
    x = jnp.zeros((1, 128, 96, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 32, 24, 17)


def test_pose_resnet_forward_shape():
    cfg = _cfg("pose_resnet", joints=17)
    model = get_pose_net(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 96, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    # ResNet /32 then 3 deconvs x2 -> /4 of input.
    assert out.shape == (1, 32, 24, 17)


def test_batchnorm_updates_stats_in_train():
    cfg = _cfg("hourglass", {"NUM_STACKS": 1, "NUM_FEATURES": 128})
    model = get_pose_net(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    _, updated = model.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_unknown_model_name():
    cfg = _cfg("hourglass")
    cfg.defrost() if cfg.is_frozen() else None
    cfg.MODEL.NAME = "no_such_model"
    with pytest.raises(KeyError):
        get_pose_net(cfg)


def test_upsample_nearest_matches_repeat():
    """The broadcast+reshape upsample must equal the two-repeat reference
    (torch nn.Upsample(scale_factor=k, mode='nearest') semantics)."""
    from fhpe_tpu.models.common import upsample_nearest

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 7, 3))
    for k in (2, 4):
        ref = jnp.repeat(jnp.repeat(x, k, axis=1), k, axis=2)
        np.testing.assert_array_equal(np.asarray(upsample_nearest(x, k)),
                                      np.asarray(ref))
