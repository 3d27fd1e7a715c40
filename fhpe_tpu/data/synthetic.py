"""Synthetic pose dataset for hermetic tests and benchmarks.

The reference has no test assets (SURVEY.md section 4); this generator
produces deterministic images with bright disks at joint locations plus db
records in the exact format of the MPII/COCO builders, so train/eval
integration tests run with no downloaded data.  A model trained briefly on
these must drive PCK up — the end-to-end smoke signal.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def make_synthetic_db(out_dir: str, num_samples: int = 16,
                      num_joints: int = 16, image_hw: Tuple[int, int] = (256, 256),
                      seed: int = 0) -> List[dict]:
    """Write jpg images with disk-marked joints; return db records."""
    import cv2

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    h, w = image_hw
    db = []
    for i in range(num_samples):
        img = rng.randint(0, 40, size=(h, w, 3), dtype=np.uint8)
        joints_3d = np.zeros((num_joints, 3))
        joints_3d_vis = np.zeros((num_joints, 3))
        margin = min(40, h // 4, w // 4)
        for j in range(num_joints):
            x = rng.randint(margin, w - margin)
            y = rng.randint(margin, h - margin)
            color = (int(80 + 10 * j), int(255 - 10 * j), 200)
            cv2.circle(img, (x, y), 6, color, -1)
            joints_3d[j, :2] = (x, y)
            joints_3d_vis[j, :2] = 1
        path = os.path.join(out_dir, f"synt_{i:06d}.jpg")
        cv2.imwrite(path, img)

        center = np.array([w / 2, h / 2], dtype=np.float64)
        scale = np.array([w / 200.0, h / 200.0], dtype=np.float64)
        db.append({
            "image": path,
            "center": center,
            "scale": scale,
            "joints_3d": joints_3d,
            "joints_3d_vis": joints_3d_vis,
            "filename": "",
            "imgnum": 0,
        })
    return db
