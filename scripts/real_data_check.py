"""Real-data readiness harness: make the headline parity run one command.

The reference's defining numbers (MPII PCKh@0.5 90.520 teacher / 89.040
FPD student, README.md:36-39; COCO AP 0.751 W32-FPD, README.md:55-57)
need real MPII/COCO and the published teacher checkpoints, which this box
does not have.  This script is the turnkey gate for the day they appear:
pointed at a dataset root (and optionally a teacher ``.pth``), it

1. builds the db through the REAL pipeline and checks record counts
   against the known split sizes,
2. bit-compares N real ``__getitem__`` samples against the actual torch
   reference ``JointsDataset`` (eval mode — deterministic),
3. imports the teacher checkpoint and runs the full validate() stack
   (flip test + decode + dataset evaluate), printing PCKh/AP and checking
   it against ``--expect-perf`` when given,
4. prints (or, with ``--launch``, executes) the training command for the
   parity run.

Usage (see docs/RUNBOOK.md):
  python scripts/real_data_check.py --cfg experiments/mpii/hourglass/\
hg8_256x256_d256x3_adam_lr2.5e-4.yaml --root /data/mpii \
      --teacher models/hg8_teacher.pth --expect-perf 90.3 --launch

Hermetic self-test: tests/test_real_data_check.py drives every stage on a
synthetic MPII root with a freshly-built torch stand-in teacher.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# Known split sizes for the reference's annotation releases
# (mpii annot json of this codebase family; README.md data preparation).
# COCO gt counts are what the reference's `=> load {} samples` line prints
# (lib/dataset/coco.py:123) for person_keypoints_{split}.json: one record
# per person instance with keypoints.
EXPECTED_DB_COUNTS = {
    ("mpii", "train"): 22246,
    ("mpii", "valid"): 2958,
    ("coco", "train2017"): 149813,
    ("coco", "val2017"): 6352,      # gt-bbox eval db (TEST.USE_GT_BBOX)
}

# The released person-detection results file the headline AP table uses
# (README.md:51,62 — detector with person AP 56.4 on val2017): the
# reference logs `=> Total boxes: 104125` and, at the configs' IMAGE_THRE
# 0.0, `=> Total boxes after fliter low score@0.0: 104125`
# (lib/dataset/coco.py:268,298).
EXPECTED_COCO_DET_BOXES = {
    "val2017": 104125,
}


class CheckFailure(RuntimeError):
    pass


def _log(msg):
    print(f"[real_data_check] {msg}", flush=True)


# ---------------------------------------------------------------------------
# stage 1: db build + counts
# ---------------------------------------------------------------------------

def check_db(cfg, expect_train: int | None, expect_val: int | None):
    from fhpe_tpu.data import build_db

    name = cfg.DATASET.DATASET
    counts = {}
    # the known gt counts only gate the test split when it IS the gt db;
    # with USE_GT_BBOX False the test-split db is the detector db, gated
    # separately by check_coco_detector_db
    val_expected = expect_val
    if val_expected is None and (name != "coco" or cfg.TEST.USE_GT_BBOX):
        val_expected = EXPECTED_DB_COUNTS.get((name, cfg.DATASET.TEST_SET))
    for split, is_train, expected in (
            (cfg.DATASET.TRAIN_SET, True,
             expect_train if expect_train is not None
             else EXPECTED_DB_COUNTS.get((name, cfg.DATASET.TRAIN_SET))),
            (cfg.DATASET.TEST_SET, False, val_expected)):
        db = build_db(cfg, split, is_train)
        counts[split] = db
        _log(f"db[{name}/{split}]: {len(db)} records")
        if expected is not None and len(db) != expected:
            raise CheckFailure(
                f"db count for {name}/{split} is {len(db)}, expected "
                f"{expected} — wrong annotation release or partial data?")
        if not db:
            raise CheckFailure(f"db for {name}/{split} is empty")
        # first/last record images must exist (zip paths via zipreader)
        for rec in (db[0], db[-1]):
            path = rec["image"]
            real = path.split("@")[0] if "@" in path else path
            if not os.path.exists(real):
                raise CheckFailure(f"image missing on disk: {path}")
    return counts


# ---------------------------------------------------------------------------
# stage 1b (COCO): detector-bbox db gate (TEST.COCO_BBOX_FILE)
# ---------------------------------------------------------------------------

def check_coco_detector_db(cfg, expect_boxes: int | None):
    """Gate the detector-box eval db the headline AP table depends on.

    Mirrors the two counts the reference logs while loading the released
    detection-results file (lib/dataset/coco.py:259-300): the raw person
    detection count (`Total boxes`, :268) and the post-IMAGE_THRE db size
    (:271-299).  Runs whenever TEST.COCO_BBOX_FILE is set, independent of
    USE_GT_BBOX, so one command validates BOTH eval dbs.
    """
    import json

    from fhpe_tpu.data import coco as coco_mod

    bbox_file = cfg.TEST.COCO_BBOX_FILE
    if not os.path.exists(bbox_file):
        raise CheckFailure(f"TEST.COCO_BBOX_FILE missing: {bbox_file}")
    with open(bbox_file) as f:
        raw = json.load(f)
    n_person = sum(1 for d in raw if d.get("category_id") == 1)
    _log(f"detector file {os.path.basename(bbox_file)}: {len(raw)} dets, "
         f"{n_person} person (reference 'Total boxes', coco.py:268)")

    aspect = cfg.MODEL.IMAGE_SIZE[0] / cfg.MODEL.IMAGE_SIZE[1]
    db = coco_mod.build_detection_db(
        cfg.DATASET.ROOT, cfg.DATASET.TEST_SET, bbox_file, aspect,
        cfg.TEST.IMAGE_THRE, cfg.DATASET.DATA_FORMAT)
    _log(f"detector db after IMAGE_THRE@{cfg.TEST.IMAGE_THRE}: "
         f"{len(db)} boxes")
    expected = (expect_boxes if expect_boxes is not None
                else EXPECTED_COCO_DET_BOXES.get(cfg.DATASET.TEST_SET))
    if expected is not None and n_person != expected:
        raise CheckFailure(
            f"person detection count is {n_person}, expected {expected} — "
            f"wrong detection-results release?")
    if not db:
        raise CheckFailure("detector db is empty after IMAGE_THRE filter")
    for rec in (db[0], db[-1]):
        path = rec["image"]
        real = path.split("@")[0] if "@" in path else path
        if not os.path.exists(real):
            raise CheckFailure(f"detector-db image missing on disk: {path}")
    return db


# ---------------------------------------------------------------------------
# stage 2: N-sample getitem bit-parity vs the torch reference class
# ---------------------------------------------------------------------------

def check_getitem_parity(cfg, db, n_samples: int):
    import reference_oracle

    reference_oracle.install()
    from types import SimpleNamespace

    from dataset.JointsDataset import JointsDataset

    from fhpe_tpu.data import PoseDataSource, dataset_meta

    meta = dataset_meta(cfg.DATASET.DATASET)
    rcfg = SimpleNamespace(
        OUTPUT_DIR="",
        DATASET=SimpleNamespace(
            DATA_FORMAT=cfg.DATASET.DATA_FORMAT,
            SCALE_FACTOR=cfg.DATASET.SCALE_FACTOR,
            ROT_FACTOR=cfg.DATASET.ROT_FACTOR,
            FLIP=cfg.DATASET.FLIP,
            NUM_JOINTS_HALF_BODY=cfg.DATASET.NUM_JOINTS_HALF_BODY,
            PROB_HALF_BODY=cfg.DATASET.PROB_HALF_BODY,
            COLOR_RGB=cfg.DATASET.COLOR_RGB),
        MODEL=SimpleNamespace(
            TARGET_TYPE=cfg.MODEL.TARGET_TYPE,
            IMAGE_SIZE=list(cfg.MODEL.IMAGE_SIZE),
            HEATMAP_SIZE=list(cfg.MODEL.HEATMAP_SIZE),
            SIGMA=cfg.MODEL.SIGMA),
        LOSS=SimpleNamespace(
            USE_DIFFERENT_JOINTS_WEIGHT=cfg.LOSS.USE_DIFFERENT_JOINTS_WEIGHT),
    )
    ref = JointsDataset(rcfg, root="", image_set=cfg.DATASET.TEST_SET,
                        is_train=False, transform=None)
    ref.num_joints = meta["num_joints"]
    ref.flip_pairs = meta["flip_pairs"]
    ref.upper_body_ids = meta["upper_body_ids"]
    ref.lower_body_ids = meta["lower_body_ids"]
    ref.aspect_ratio = cfg.MODEL.IMAGE_SIZE[0] / cfg.MODEL.IMAGE_SIZE[1]
    ref.db = [dict(r) for r in db[:n_samples]]

    ours = PoseDataSource(cfg, db[:n_samples], is_train=False,
                          flip_pairs=meta["flip_pairs"],
                          upper_body_ids=meta["upper_body_ids"],
                          joints_weight=meta["joints_weight"])
    for i in range(min(n_samples, len(db))):
        r_input, r_target, r_tw, r_meta = ref[i]
        s = ours.get_sample(i, host_targets=True)
        if not np.array_equal(s["image"], np.asarray(r_input)):
            raise CheckFailure(
                f"sample {i} ({db[i]['image']}): warped image differs from "
                f"the torch reference (decode/warp parity broken?)")
        if not np.allclose(np.transpose(s["target"], (2, 0, 1)),
                           np.asarray(r_target), atol=1e-6):
            raise CheckFailure(f"sample {i}: target heatmaps differ")
        if not np.array_equal(s["target_weight"], np.asarray(r_tw)[:, 0]):
            raise CheckFailure(f"sample {i}: target_weight differs")
    _log(f"getitem parity: {min(n_samples, len(db))} real samples "
         f"bit-identical to the torch reference")


# ---------------------------------------------------------------------------
# stage 3: teacher import + full validate
# ---------------------------------------------------------------------------

def check_teacher(cfg, teacher_path: str, expect_perf: float | None,
                  tolerance: float):
    import logging

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from fhpe_tpu.cli.common import build_loaders, make_evaluate_fn, validate
    from fhpe_tpu.models import get_pose_net, is_multi_output
    from fhpe_tpu.parallel.mesh import get_mesh
    from fhpe_tpu.utils.torch_import import (import_for_model,
                                             load_torch_state_dict)

    logger = logging.getLogger("real_data_check")
    logging.basicConfig(level=logging.INFO)

    dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
             else jnp.float32)
    model = get_pose_net(cfg, dtype=dtype)
    sd = load_torch_state_dict(teacher_path)
    imported = import_for_model(cfg, sd)
    sample = jnp.zeros((1, cfg.MODEL.IMAGE_SIZE[1], cfg.MODEL.IMAGE_SIZE[0],
                        3))
    init = model.init(jax.random.PRNGKey(0), sample, train=False)
    variables = serialization.from_state_dict(init, imported)
    _log(f"teacher imported from {teacher_path}: "
         f"{len(sd)} torch tensors mapped")

    n_devices = len(jax.devices())
    mesh = get_mesh(n_devices)
    _, val_loader, meta = build_loaders(cfg, n_devices, train=False)
    perf, name_values, *_ = validate(
        cfg, model, variables, val_loader, mesh, meta, logger,
        multi_output=is_multi_output(model),
        evaluate_fn=make_evaluate_fn(cfg), output_dir="")
    _log(f"teacher validate: perf={perf:.4f} "
         f"({dict(name_values) if name_values else ''})")
    if expect_perf is not None and abs(perf - expect_perf) > tolerance:
        raise CheckFailure(
            f"teacher perf {perf:.4f} differs from expected "
            f"{expect_perf:.4f} by more than {tolerance}")
    return perf


# ---------------------------------------------------------------------------
# stage 4: the parity training launch
# ---------------------------------------------------------------------------

def launch_command(args) -> list:
    if args.tcfg and args.teacher:
        cmd = [sys.executable, "-m", "fhpe_tpu.cli.fpd_train",
               "--cfg", args.cfg, "--tcfg", args.tcfg,
               "KD.TEACHER", args.teacher]
    else:
        cmd = [sys.executable, "-m", "fhpe_tpu.cli.train", "--cfg", args.cfg]
    cmd += ["DATASET.ROOT", args.root]
    cmd += list(args.opts or [])
    return cmd


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--root", required=True, help="dataset root")
    p.add_argument("--teacher", help="teacher/model .pth to import+validate")
    p.add_argument("--tcfg", help="teacher yaml (for the FPD launch)")
    p.add_argument("--n-samples", type=int, default=16,
                   help="real samples to bit-compare against torch")
    p.add_argument("--expect-train-count", type=int, default=None)
    p.add_argument("--expect-val-count", type=int, default=None)
    p.add_argument("--expect-perf", type=float, default=None,
                   help="expected validate perf for the imported teacher")
    p.add_argument("--perf-tolerance", type=float, default=None,
                   help="allowed |perf - expect-perf|; defaults to 0.5 on "
                        "the PCKh 0-100 scale, 0.005 on the AP 0-1 scale")
    p.add_argument("--expect-det-boxes", type=int, default=None,
                   help="expected person-detection count in "
                        "TEST.COCO_BBOX_FILE (default: the released "
                        "AP-56.4 file's 104125 for val2017)")
    p.add_argument("--skip-validate", action="store_true",
                   help="stop after the data checks (no device work)")
    p.add_argument("--launch", action="store_true",
                   help="execute the parity training run when checks pass")
    p.add_argument("opts", nargs="*", help="extra KEY VALUE config overrides")
    args = p.parse_args(argv)

    from fhpe_tpu.config import load_config

    cfg = load_config(args.cfg, opts=(["DATASET.ROOT", args.root]
                                      + list(args.opts or [])))

    tolerance = args.perf_tolerance
    if tolerance is None:
        tolerance = (0.005 if args.expect_perf is not None
                     and args.expect_perf <= 1.0 else 0.5)

    try:
        dbs = check_db(cfg, args.expect_train_count, args.expect_val_count)
        if cfg.DATASET.DATASET == "coco" and cfg.TEST.COCO_BBOX_FILE:
            check_coco_detector_db(cfg, args.expect_det_boxes)
        check_getitem_parity(cfg, dbs[cfg.DATASET.TEST_SET], args.n_samples)
        if args.teacher and not args.skip_validate:
            check_teacher(cfg, args.teacher, args.expect_perf, tolerance)
    except CheckFailure as e:
        _log(f"FAILED: {e}")
        return 1

    cmd = launch_command(args)
    _log("all checks passed")
    _log("parity run command: " + " ".join(cmd))
    if args.launch:
        return subprocess.call(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
