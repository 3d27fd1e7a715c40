"""Shared setup for tests that execute the torch reference as an oracle.

Installs import stubs for the reference's unavailable dependencies
(json_tricks, pycocotools, compiled nms extensions) exactly once with one
canonical stub set, and puts /root/reference/lib on sys.path.  Also provides
a context manager that seeds the process-global RNGs and restores their
state afterwards (the reference draws from global np.random/random).
"""

from __future__ import annotations

import contextlib
import json as _json
import random as _pyrandom
import sys
import types as _types

import numpy as _np

REF_LIB = "/root/reference/lib"


def install():
    """Idempotent: stub reference deps + add its lib dir to sys.path."""
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    sys.modules.setdefault("json_tricks", _json)
    if "torchvision" not in sys.modules:
        # utils/vis.py imports torchvision only for make_grid in the
        # DEBUG.* image dumps, which oracle runs keep disabled.
        tv = _types.ModuleType("torchvision")
        tvu = _types.ModuleType("torchvision.utils")

        def _no_grid(*a, **k):
            raise RuntimeError("torchvision stub: DEBUG image dumps are "
                               "not available in oracle runs")

        tvu.make_grid = _no_grid
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    for name, attr in (("nms.cpu_nms", "cpu_nms"), ("nms.gpu_nms", "gpu_nms")):
        if name not in sys.modules:
            m = _types.ModuleType(name)
            setattr(m, attr, lambda *a, **k: [])
            sys.modules[name] = m
    if "yacs" not in sys.modules:
        # yacs is not on this box; fhpe's CfgNode is API-compatible with
        # the subset the reference's lib/config uses (empty CN(),
        # attribute building, new_allowed EXTRA nodes, defrost/merge/
        # freeze) — verified by tests/test_epoch_loop_parity.py driving
        # the real tools/train.py through it.
        from fhpe_tpu.config.node import CfgNode as _CfgNode

        yacs = _types.ModuleType("yacs")
        yacs_config = _types.ModuleType("yacs.config")
        yacs_config.CfgNode = _CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "pycocotools" not in sys.modules:
        pct = _types.ModuleType("pycocotools")
        pc = _types.ModuleType("pycocotools.coco")
        pc.COCO = object
        pe = _types.ModuleType("pycocotools.cocoeval")
        pe.COCOeval = object
        pct.coco, pct.cocoeval = pc, pe
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.coco"] = pc
        sys.modules["pycocotools.cocoeval"] = pe


@contextlib.contextmanager
def seeded_global_rng(seed: int):
    """Seed np.random + random for a reference draw, restoring state after."""
    np_state = _np.random.get_state()
    py_state = _pyrandom.getstate()
    try:
        _np.random.seed(seed)
        _pyrandom.seed(seed)
        yield
    finally:
        _np.random.set_state(np_state)
        _pyrandom.setstate(py_state)
