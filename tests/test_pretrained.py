"""MODEL.PRETRAINED (ImageNet trunk) initialization.

Reference semantics being pinned (oracles are real torch reference models
under /root/reference/lib):
* pose_resnet: ``init_weights`` loads the torchvision ImageNet checkpoint
  non-strict — trunk tensors replaced, deconv/final keep fresh init
  (pose_resnet.py:209-249).
* pose_hrnet: checkpoint keys are filtered by first dotted component
  against ``PRETRAINED_LAYERS`` (or '*') before the non-strict load
  (pose_hrnet.py:480-489).
* missing file: no-op from-random-init (with a prominent warning; the
  reference HRNet raises — deviation documented in docs/PARITY.md).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/lib")

from fhpe_tpu.config import get_default_config, load_config
from fhpe_tpu.config.defaults import MODEL_EXTRAS
from fhpe_tpu.models import get_pose_net
from fhpe_tpu.utils.torch_import import (filter_pretrained_layers,
                                         load_pretrained, merge_variables)

W32_YAML = "/root/reference/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml"

# the PRETRAINED_LAYERS list every reference HRNet YAML ships
HRNET_PRETRAINED_LAYERS = [
    "conv1", "bn1", "conv2", "bn2", "layer1", "transition1", "stage2",
    "transition2", "stage3", "transition3", "stage4"]


class _DCfg(dict):
    __getattr__ = dict.__getitem__


def _wrap(d):
    return (_DCfg({k: _wrap(v) for k, v in d.items()})
            if isinstance(d, dict) else d)


def _resnet18_cfg():
    cfg = get_default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.NUM_JOINTS = 8
    cfg.MODEL.EXTRA = MODEL_EXTRAS["pose_resnet"]()
    cfg.MODEL.EXTRA.NUM_LAYERS = 18
    cfg.MODEL.EXTRA.NUM_DECONV_FILTERS = [64, 64, 64]
    return cfg


def _init_variables(cfg):
    model = get_pose_net(cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)), train=False)
    return {"params": v["params"], "batch_stats": v["batch_stats"]}


def _imagenet_resnet18_sd(tmp_path):
    """Simulated torchvision ImageNet checkpoint: the reference torch
    PoseResNet's trunk keys + an fc head, no deconv/final keys."""
    import models.pose_resnet as ref_rn

    rcfg = _wrap({"MODEL": {"EXTRA": {
        "NUM_LAYERS": 18, "DECONV_WITH_BIAS": False, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64], "NUM_DECONV_KERNELS": [4, 4, 4],
        "FINAL_CONV_KERNEL": 1}, "NUM_JOINTS": 8, "INIT_WEIGHTS": False,
        "PRETRAINED": ""}})
    tmodel = ref_rn.get_pose_net(rcfg, is_train=False).eval()
    sd = {k: v for k, v in tmodel.state_dict().items()
          if not k.startswith(("deconv_layers", "final_layer"))}
    sd["fc.weight"] = torch.randn(1000, 512)
    sd["fc.bias"] = torch.randn(1000)
    path = tmp_path / "resnet18-imagenet.pth"
    torch.save(sd, str(path))
    return str(path), {k: v.numpy() for k, v in sd.items()}


def test_resnet_trunk_loaded_head_fresh(tmp_path):
    cfg = _resnet18_cfg()
    path, sd = _imagenet_resnet18_sd(tmp_path)
    cfg.defrost()
    cfg.MODEL.PRETRAINED = path
    cfg.freeze()

    before = _init_variables(cfg)
    after, n = load_pretrained(cfg, jax.tree_util.tree_map(np.array, before))
    assert n > 0

    # trunk replaced: conv1 kernel == OIHW->HWIO transpose of the torch one
    np.testing.assert_array_equal(
        after["params"]["conv1"]["Conv_0"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    # BN running stats imported too (strict=False loads them in torch)
    np.testing.assert_array_equal(
        after["batch_stats"]["bn1"]["BatchNorm_0"]["mean"],
        sd["bn1.running_mean"])
    # head untouched: deconv + final keep fresh init
    np.testing.assert_array_equal(
        after["params"]["deconv0"]["ConvTranspose_0"]["kernel"],
        before["params"]["deconv0"]["ConvTranspose_0"]["kernel"])
    np.testing.assert_array_equal(
        after["params"]["final_layer"]["Conv_0"]["kernel"],
        before["params"]["final_layer"]["Conv_0"]["kernel"])


def test_resnet_pretrained_forward_runs(tmp_path):
    """Model with imported trunk still produces finite heatmaps."""
    cfg = _resnet18_cfg()
    path, _ = _imagenet_resnet18_sd(tmp_path)
    cfg.defrost()
    cfg.MODEL.PRETRAINED = path
    cfg.freeze()
    variables = _init_variables(cfg)
    variables, n = load_pretrained(
        cfg, jax.tree_util.tree_map(np.array, variables))
    assert n > 0
    model = get_pose_net(cfg, dtype=jnp.float32)
    out = model.apply(variables, jnp.ones((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_missing_file_is_noop_from_random_init():
    cfg = _resnet18_cfg()
    cfg.defrost()
    cfg.MODEL.PRETRAINED = "/nonexistent/imagenet.pth"
    cfg.freeze()
    before = _init_variables(cfg)
    after, n = load_pretrained(cfg, before)
    assert n == 0 and after is before


def test_hourglass_has_no_pretrained_path(tmp_path):
    cfg = get_default_config()
    cfg.MODEL.NAME = "hourglass"
    cfg.MODEL.EXTRA = MODEL_EXTRAS["hourglass"]()
    p = tmp_path / "x.pth"
    torch.save({}, str(p))
    cfg.MODEL.PRETRAINED = str(p)
    v = {"params": {}, "batch_stats": {}}
    out, n = load_pretrained(cfg, v)
    assert n == 0 and out is v


def test_filter_pretrained_layers():
    sd = {"conv1.weight": 1, "layer1.0.conv1.weight": 2,
          "classifier.weight": 3, "incre_modules.0.weight": 4}
    kept = filter_pretrained_layers(sd, ["conv1", "layer1"])
    assert set(kept) == {"conv1.weight", "layer1.0.conv1.weight"}
    assert filter_pretrained_layers(sd, ["*"]) == sd


def test_merge_variables_shape_mismatch_skipped():
    variables = {"params": {"a": np.zeros((2, 2)), "b": np.zeros(3)}}
    partial = {"params": {"a": np.ones((2, 2)), "b": np.ones(4),
                          "c": np.ones(1)}}
    merged, loaded, skipped = merge_variables(variables, partial)
    assert [k[-1] for k in loaded] == ["a"]
    assert sorted(k[-1] for k in skipped) == ["b", "c"]
    np.testing.assert_array_equal(merged["params"]["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["params"]["b"], np.zeros(3))


@pytest.mark.slow
def test_hrnet_pretrained_layers_respected(tmp_path):
    """Filtered HRNet load: trunk tensors land, final_layer stays fresh even
    though the checkpoint contains a (shape-compatible trunk) final_layer."""
    import yaml as _yaml
    import models.pose_hrnet as ref_hr

    rcfg = _wrap(_yaml.safe_load(open(W32_YAML)))
    tmodel = ref_hr.PoseHighResolutionNet(rcfg).eval()
    sd = dict(tmodel.state_dict())
    # simulate ImageNet-classification extras that must be ignored
    sd["classifier.weight"] = torch.randn(1000, 2048)
    sd["incre_modules.0.0.conv1.weight"] = torch.randn(32, 32, 1, 1)
    path = tmp_path / "hrnet_w32_imagenet.pth"
    torch.save(sd, str(path))

    cfg = load_config(W32_YAML)
    assert list(cfg.MODEL.EXTRA.PRETRAINED_LAYERS) == HRNET_PRETRAINED_LAYERS
    cfg.defrost()
    cfg.MODEL.PRETRAINED = str(path)
    cfg.freeze()

    model = get_pose_net(cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 128, 96, 3)), train=False)
    before = {"params": jax.tree_util.tree_map(np.array, v["params"]),
              "batch_stats": jax.tree_util.tree_map(np.array,
                                                    v["batch_stats"])}
    after, n = load_pretrained(cfg, before)
    assert n > 300  # whole trunk

    np.testing.assert_array_equal(
        after["params"]["conv1"]["Conv_0"]["kernel"],
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    # stage4 (listed) loaded
    t = sd["stage4.0.branches.0.0.conv1.weight"].numpy()
    np.testing.assert_array_equal(
        after["params"]["stage4_m0"]["branch0"]["b0"]["conv1"]["Conv_0"]
             ["kernel"],
        np.transpose(t, (2, 3, 1, 0)))
    # final_layer NOT in PRETRAINED_LAYERS -> keeps fresh init
    np.testing.assert_array_equal(
        after["params"]["final_layer"]["Conv_0"]["kernel"],
        before["params"]["final_layer"]["Conv_0"]["kernel"])
