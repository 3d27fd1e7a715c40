"""Model registry.

String-keyed factory dispatch replacing the reference's
``eval('models.' + cfg.MODEL.NAME + '.get_pose_net')`` (tools/train.py:118)
with an explicit registry.  All models are NHWC flax modules; hourglass
returns per-stack heatmaps stacked on a leading axis, HRNet/PoseResNet a
single heatmap tensor — ``num_outputs`` tells callers which.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import hourglass, pose_hrnet, pose_resnet
from .common import param_count

_REGISTRY = {
    "hourglass": hourglass.get_pose_net,
    "pose_hrnet": pose_hrnet.get_pose_net,
    "pose_resnet": pose_resnet.get_pose_net,
}


def get_pose_net(cfg, dtype=jnp.bfloat16):
    name = cfg.MODEL.NAME
    if name not in _REGISTRY:
        raise KeyError(f"unknown MODEL.NAME '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg, dtype=dtype)


def is_multi_output(model) -> bool:
    """True for models emitting per-stack heatmaps (stacked hourglass)."""
    return isinstance(model, hourglass.HourglassNet)


__all__ = ["get_pose_net", "is_multi_output", "param_count",
           "hourglass", "pose_hrnet", "pose_resnet"]
