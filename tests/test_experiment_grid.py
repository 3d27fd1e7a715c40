"""Experiment-grid coverage: the repo ships every reference YAML.

Pins VERDICT r1 item 5: ``experiments/`` mirrors the reference's 54-file
tree 1:1 (plus this repo's TPU-tuned variants), each file loads through the
config schema, and each unique model configuration builds and emits
correctly-shaped heatmaps (shape-level ``jax.eval_shape`` — no compile).
"""

import glob
import os

import pytest

import jax
import jax.numpy as jnp

from fhpe_tpu.config import load_config
from fhpe_tpu.models import get_pose_net

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OURS = os.path.join(REPO, "experiments")
REF = "/root/reference/experiments"

REF_RELPATHS = sorted(
    os.path.relpath(p, REF)
    for p in glob.glob(f"{REF}/**/*.yaml", recursive=True))
ALL_OURS = sorted(
    os.path.relpath(p, OURS)
    for p in glob.glob(f"{OURS}/**/*.yaml", recursive=True))


def test_grid_mirrors_reference_tree():
    assert len(REF_RELPATHS) == 54
    missing = [p for p in REF_RELPATHS if p not in set(ALL_OURS)]
    assert not missing, f"missing reference experiment YAMLs: {missing}"


@pytest.mark.parametrize("rel", ALL_OURS)
def test_yaml_loads(rel):
    cfg = load_config(os.path.join(OURS, rel), opts=[])
    assert cfg.MODEL.NAME in ("hourglass", "pose_hrnet", "pose_resnet")
    assert len(cfg.MODEL.IMAGE_SIZE) == 2


def _model_signature(cfg):
    return (cfg.MODEL.NAME, cfg.MODEL.NUM_JOINTS,
            tuple(cfg.MODEL.IMAGE_SIZE), str(sorted(dict(cfg.MODEL.EXTRA))),
            str(cfg.MODEL.EXTRA))


def _unique_model_cfgs():
    seen = {}
    for rel in ALL_OURS:
        cfg = load_config(os.path.join(OURS, rel), opts=[])
        seen.setdefault(_model_signature(cfg), (rel, cfg))
    return sorted(seen.values())


_UNIQUE = _unique_model_cfgs()


def _broken_upstream(cfg) -> bool:
    """coco/hourglass *384x288* YAMLs crash in the reference itself: the
    hourglass needs image dims divisible by 64 (stem /4 + 4 poolings), and
    288 is not — torch fails with 'size of tensor a (9) must match b (8)'
    (verified against /root/reference/lib/models/hourglass.py). The YAMLs
    ship for grid parity but are unrunnable in both implementations."""
    return (cfg.MODEL.NAME == "hourglass"
            and any(d % 64 for d in cfg.MODEL.IMAGE_SIZE))


@pytest.mark.slow
@pytest.mark.parametrize("rel,cfg", _UNIQUE, ids=[r for r, _ in _UNIQUE])
def test_model_builds_and_shapes(rel, cfg):
    if _broken_upstream(cfg):
        pytest.xfail("broken upstream: reference hourglass also fails at "
                     "384x288 (non-/64 image size)")
    model = get_pose_net(cfg, dtype=jnp.float32)
    w, h = cfg.MODEL.IMAGE_SIZE
    hw, hh = cfg.MODEL.HEATMAP_SIZE
    x = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    out, _ = jax.eval_shape(
        lambda r, xx: model.init_with_output(r, xx, train=False),
        jax.random.PRNGKey(0), x)
    shape = out.shape
    if cfg.MODEL.NAME == "hourglass":  # per-stack leading axis
        assert shape[0] == cfg.MODEL.EXTRA.NUM_STACKS
        shape = shape[1:]
    assert shape == (1, hh, hw, cfg.MODEL.NUM_JOINTS), rel
