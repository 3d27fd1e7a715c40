#!/usr/bin/env python
"""Regenerate the experiment grid mirroring the reference's 54 YAMLs.

Each file under ``/root/reference/experiments`` is parsed and re-emitted at
the same relative path under ``experiments/`` in this repo's canonical YAML
style (sorted keys, block style).  Contents are semantically identical
config data — the experiment grid IS the reference's capability surface —
but every file is round-tripped through yaml, validated against our config
schema, and annotated.

Known upstream defect handled here: the reference's
``fpd_coco/resnet/resnet_template.yaml`` nests its KD block as ``KD.KD.*``
(rejected by yacs and by our schema alike); it is emitted with the intended
flat ``KD.*`` keys (see docs/PARITY.md "Known deliberate divergences").

Usage:  python scripts/gen_experiment_grid.py
"""

from __future__ import annotations

import glob
import os
import sys

import yaml

REF = "/root/reference/experiments"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "experiments")

HEADER = ("# Mirrors reference experiments/{rel} (normalized; "
          "see scripts/gen_experiment_grid.py)\n")
FIX_NOTE = ("# NOTE: upstream file nests KD under a duplicated 'KD:' key "
            "(invalid for yacs too);\n# emitted here with the intended flat "
            "KD block.\n")


def fix_nested_kd(tree: dict) -> bool:
    """The upstream defect writes dotted keys inside the KD block
    ('KD.TRAIN_TYPE: ...' under 'KD:'), which yacs parses as KD.KD.*."""
    kd = tree.get("KD")
    if not isinstance(kd, dict):
        return False
    fixed = False
    for k in list(kd):
        if k.startswith("KD."):
            kd[k[len("KD."):]] = kd.pop(k)
            fixed = True
    return fixed


def main() -> None:
    sys.path.insert(0, os.path.dirname(OUT))
    from fhpe_tpu.config import load_config

    n = 0
    for path in sorted(glob.glob(f"{REF}/**/*.yaml", recursive=True)):
        rel = os.path.relpath(path, REF)
        with open(path) as f:
            tree = yaml.safe_load(f)
        fixed = fix_nested_kd(tree)
        out_path = os.path.join(OUT, rel)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            f.write(HEADER.format(rel=rel))
            if fixed:
                f.write(FIX_NOTE)
            yaml.safe_dump(tree, f, default_flow_style=False, sort_keys=True)
        load_config(out_path, opts=[])  # must pass schema validation
        n += 1
    print(f"wrote {n} experiment YAMLs under {OUT}")


if __name__ == "__main__":
    main()
