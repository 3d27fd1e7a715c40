"""Hermetic drive of scripts/real_data_check.py on synthetic stand-ins.

Exercises every stage of the readiness harness — db count gate, N-sample
getitem bit-parity vs the torch reference class, torch-teacher import +
full validate, and the launch-command assembly — so the real-data parity
run (docs/RUNBOOK.md) is a tested single command the day data appears.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import reference_oracle

reference_oracle.install()

import real_data_check
from fhpe_tpu.data.synthetic import make_synthetic_mpii

YAML = "/root/repo/experiments/mpii/hourglass/hg8_256x256_d256x3_adam_lr2.5e-4.yaml"
N_IMGS = 12
OVERRIDES = [
    "MODEL.IMAGE_SIZE", "64,64", "MODEL.HEATMAP_SIZE", "16,16",
    "MODEL.EXTRA.NUM_STACKS", "2", "MODEL.EXTRA.NUM_FEATURES", "16",
    "TEST.BATCH_SIZE_PER_GPU", "2", "WORKERS", "2",
    "TPU.COMPUTE_DTYPE", "float32", "DATASET.CACHE_ROOT", "",
]


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpii_root")
    make_synthetic_mpii(str(root), image_set="train", num_images=N_IMGS,
                        image_hw=(96, 96), seed=0)
    make_synthetic_mpii(str(root), image_set="valid", num_images=N_IMGS,
                        image_hw=(96, 96), seed=1)
    return str(root)


@pytest.fixture(scope="module")
def standin_teacher(tmp_path_factory):
    """A real torch reference hourglass checkpoint (s2/f16, 16 joints)."""
    import models.hourglass as ref_hg

    rcfg = SimpleNamespace(MODEL=SimpleNamespace(
        EXTRA=SimpleNamespace(NUM_FEATURES=16, NUM_STACKS=2, NUM_BLOCKS=1),
        NUM_JOINTS=16))
    torch.manual_seed(7)
    model = ref_hg.get_pose_net(rcfg, is_train=True)
    path = tmp_path_factory.mktemp("teacher") / "standin_hg2f16.pth"
    torch.save({"state_dict": model.state_dict()}, str(path))
    return str(path)


def test_all_stages_pass(synthetic_root, standin_teacher, capsys):
    rc = real_data_check.main([
        "--cfg", YAML, "--root", synthetic_root,
        "--teacher", standin_teacher,
        "--n-samples", "6",
        "--expect-train-count", str(N_IMGS),
        "--expect-val-count", str(N_IMGS),
    ] + OVERRIDES)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "getitem parity" in out
    assert "teacher validate: perf=" in out
    assert "parity run command:" in out


def test_wrong_count_fails(synthetic_root):
    rc = real_data_check.main([
        "--cfg", YAML, "--root", synthetic_root,
        "--expect-train-count", str(N_IMGS + 5),
        "--skip-validate",
    ] + OVERRIDES)
    assert rc == 1


def test_fpd_launch_command(synthetic_root, standin_teacher):
    args = SimpleNamespace(cfg="student.yaml", tcfg="teacher.yaml",
                           teacher=standin_teacher, root=synthetic_root,
                           opts=["TRAIN.END_EPOCH", "2"])
    cmd = real_data_check.launch_command(args)
    assert "-m" in cmd and "fhpe_tpu.cli.fpd_train" in cmd
    assert "KD.TEACHER" in cmd and standin_teacher in cmd
    assert cmd[-2:] == ["TRAIN.END_EPOCH", "2"]


# ---------------------------------------------------------------------------
# COCO leg (round-4 verdict next-step #4): gt-db counts, detector-bbox db,
# getitem parity — the one-command gate for the AP headline table.
# ---------------------------------------------------------------------------

COCO_YAML = "/root/repo/experiments/coco/hrnet/w32_256x192_adam_lr1e-3.yaml"
N_DETS = 9


@pytest.fixture(scope="module")
def synthetic_coco_root(tmp_path_factory):
    import json

    from fhpe_tpu.data.synthetic import make_synthetic_coco

    root = tmp_path_factory.mktemp("coco_root")
    make_synthetic_coco(str(root), image_set="train2017",
                        num_images=N_IMGS, image_hw=(128, 96), seed=2)
    make_synthetic_coco(str(root), image_set="val2017",
                        num_images=N_IMGS, image_hw=(128, 96), seed=3)
    # detection-results stand-in: person boxes over the first val images,
    # plus one non-person and one low-score det that the loaders must drop
    dets = [{"image_id": (i % N_IMGS) + 1, "category_id": 1,
             "bbox": [8.0 + i, 6.0, 70.0, 90.0], "score": 0.9 - 0.05 * i}
            for i in range(N_DETS)]
    dets.append({"image_id": 1, "category_id": 3,
                 "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.99})
    dets.append({"image_id": 2, "category_id": 1,
                 "bbox": [0.0, 0.0, 10.0, 10.0], "score": 0.001})
    det_file = str(root / "det_val2017.json")
    with open(det_file, "w") as f:
        json.dump(dets, f)
    return str(root), det_file


COCO_OVERRIDES = [
    "MODEL.IMAGE_SIZE", "48,64", "MODEL.HEATMAP_SIZE", "12,16",
    "TEST.BATCH_SIZE_PER_GPU", "2", "WORKERS", "2",
    "TPU.COMPUTE_DTYPE", "float32", "DATASET.CACHE_ROOT", "",
]


def test_coco_gate_passes(synthetic_coco_root, capsys):
    root, det_file = synthetic_coco_root
    rc = real_data_check.main([
        "--cfg", COCO_YAML, "--root", root,
        "--n-samples", "4",
        "--expect-train-count", str(N_IMGS),
        "--expect-val-count", str(N_IMGS),
        "--expect-det-boxes", str(N_DETS + 1),  # person dets incl. low-score
        "--skip-validate",
        "TEST.COCO_BBOX_FILE", det_file, "TEST.IMAGE_THRE", "0.01",
    ] + COCO_OVERRIDES)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert f"{N_DETS + 1} person" in out
    # IMAGE_THRE drops the 0.001-score det; category filter drops the
    # non-person one
    assert f"IMAGE_THRE@0.01: {N_DETS} boxes" in out
    assert "getitem parity" in out


def test_coco_wrong_det_count_fails(synthetic_coco_root, capsys):
    root, det_file = synthetic_coco_root
    rc = real_data_check.main([
        "--cfg", COCO_YAML, "--root", root,
        "--expect-train-count", str(N_IMGS),
        "--expect-val-count", str(N_IMGS),
        "--expect-det-boxes", "104125",
        "--skip-validate",
        "TEST.COCO_BBOX_FILE", det_file,
    ] + COCO_OVERRIDES)
    assert rc == 1
    assert "wrong detection-results release" in capsys.readouterr().out


def test_coco_detector_db_as_test_db(synthetic_coco_root, capsys):
    """USE_GT_BBOX False: the test-split db IS the detector db; the gt
    count table must not gate it (the detector stage does)."""
    root, det_file = synthetic_coco_root
    rc = real_data_check.main([
        "--cfg", COCO_YAML, "--root", root,
        "--n-samples", "3",
        "--expect-train-count", str(N_IMGS),
        "--expect-det-boxes", str(N_DETS + 1),
        "--skip-validate",
        "TEST.COCO_BBOX_FILE", det_file, "TEST.USE_GT_BBOX", "False",
        "TEST.IMAGE_THRE", "0.01",
    ] + COCO_OVERRIDES)
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "getitem parity" in out
