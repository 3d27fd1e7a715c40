#!/usr/bin/env bash
# FPD distillation on COCO: HRNet-W48 teacher -> W32 student.
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.fpd_train \
    --cfg experiments/fpd_coco/hrnet/w32_fpd_student.yaml \
    --tcfg experiments/coco/hrnet/w48_256x192_teacher.yaml "$@"
