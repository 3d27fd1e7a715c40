#!/usr/bin/env bash
# FPD distillation on MPII: hourglass-8/256 teacher -> hourglass-4/128 student.
# KD.TEACHER must point at the teacher weights (msgpack, or import a .pth
# with tools/import_torch_checkpoint.py first).
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.fpd_train \
    --cfg experiments/fpd_mpii/hourglass/hg4_128_fpd_student.yaml \
    --tcfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml "$@"
