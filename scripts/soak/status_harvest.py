"""Collect round-3 TPU run results into STATUS-ready markdown.

Harvests: the generalization soak's PCK series + plateau, the FPD A/B
(both seeds, via fpd_ab_summary), and the synthetic-COCO overfit AP
series.  Usage: python scripts/soak/status_harvest.py
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..", "..")


def newest(pattern):
    runs = sorted(glob.glob(os.path.join(ROOT, pattern)),
                  key=os.path.getmtime)
    return runs[-1] if runs else None


def series(log_path, pattern):
    out = []
    with open(log_path) as f:
        for line in f:
            m = re.search(pattern, line)
            if m:
                out.append(float(m.group(1)))
    return out


def main():
    soak = newest("output/soak/synthetic/hourglass/*/running.log")
    if soak:
        s = series(soak, r"overall PCK ([0-9.]+)")
        print(f"## Soak ({soak})")
        print("PCK every-2-epochs:",
              " ".join(f"{v:.3f}" for v in s))
        if len(s) >= 8:
            tail = s[-8:]
            print(f"best {max(s):.4f}; last-8 range "
                  f"{min(tail):.3f}-{max(tail):.3f} "
                  f"(plateau spread {max(tail) - min(tail):.3f})")
        print()

    coco = newest("output/coco_overfit/coco/hourglass/*/running.log")
    if coco:
        ap = series(coco, r"\| hourglass \| ([0-9.]+) \|")
        print(f"## COCO overfit ({coco})")
        print("AP every-20-epochs:", " ".join(f"{v:.3f}" for v in ap))
        if ap:
            print(f"best AP {max(ap):.4f}, final {ap[-1]:.4f}")
        print()

    print("## FPD A/B")
    subprocess.run([sys.executable,
                    os.path.join(ROOT, "scripts/soak/fpd_ab_summary.py")])


if __name__ == "__main__":
    main()
