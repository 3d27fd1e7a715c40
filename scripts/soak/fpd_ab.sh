#!/usr/bin/env bash
# FPD efficacy A/B (docs/STATUS_R3.md): does distillation beat plain
# training at an equal step budget?  (The capability the repo is named
# for: reference lib/core/function.py:99-187, README.md:20,26.)
#
#   phase teacher : hourglass s8/f256 trained on 2048 synthetic samples
#                   (full augmentation) -> final_state.msgpack
#   phase plain   : student s4/f128 on a 256-sample subset, no KD
#   phase kd      : same student/seed/steps + teacher co-supervision
#                   (KD.ALPHA 0.5)
#
# Students are data-limited (256 samples) while the teacher saw 2048 —
# the regime where the KD signal carries information GT alone cannot.
# Both students share the identical 128-sample held-out val split.
#
# Usage: scripts/soak/fpd_ab.sh {teacher|plain|kd} [extra KEY VALUE ...]
set -e
cd "$(dirname "$0")/../.."
PHASE=${1:?"usage: fpd_ab.sh teacher|plain|kd"}
shift || true
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

STUDENT_OVERRIDES=(
  DATASET.DATASET synthetic DATASET.ROOT /tmp/fhpe_fpd_ab
  DATASET.SYNTH_SIZE 256
  TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.LR 2.5e-4 TRAIN.LR_STEP 90,120
  TRAIN.END_EPOCH 150 TRAIN.EVAL_FREQ 5 TRAIN.CKPT_FREQ 3
  TEST.BATCH_SIZE_PER_GPU 128 TEST.FLIP_TEST False
  TPU.DECODE_CACHE_MB 2048
  LOG_DIR log/fpd_ab DEBUG.DEBUG False PRINT_FREQ 100
)

case "$PHASE" in
  teacher)
    exec python -m fhpe_tpu.cli.train \
      --cfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml \
      DATASET.DATASET synthetic DATASET.ROOT /tmp/fhpe_fpd_ab_teacher \
      DATASET.SYNTH_SIZE 2048 \
      TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.LR 2.5e-4 TRAIN.LR_STEP 40,55 \
      TRAIN.END_EPOCH 65 TRAIN.EVAL_FREQ 5 TRAIN.CKPT_FREQ 2 \
      TEST.BATCH_SIZE_PER_GPU 128 TEST.FLIP_TEST False \
      TPU.DECODE_CACHE_MB 2048 \
      OUTPUT_DIR output/fpd_ab LOG_DIR log/fpd_ab \
      TPU.STALL_TIMEOUT_S 1800 DEBUG.DEBUG False PRINT_FREQ 16 "$@" ;;
  plain)
    exec python -m fhpe_tpu.cli.train \
      --cfg experiments/mpii/hourglass/hg4_128_student.yaml \
      "${STUDENT_OVERRIDES[@]}" TPU.STALL_TIMEOUT_S 1800 OUTPUT_DIR output/fpd_ab_plain "$@" ;;
  kd)
    TEACHER=$(ls -t output/fpd_ab/synthetic/hourglass/*/final_state.msgpack \
              | head -1)
    [ -n "$TEACHER" ] || { echo "run the teacher phase first"; exit 2; }
    exec python -m fhpe_tpu.cli.fpd_train \
      --cfg experiments/mpii/hourglass/hg4_128_student.yaml \
      --tcfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml \
      "${STUDENT_OVERRIDES[@]}" OUTPUT_DIR output/fpd_ab_kd \
      KD.TRAIN_TYPE FPD KD.TEACHER "$TEACHER" KD.ALPHA 0.5 \
      TPU.STALL_TIMEOUT_S 1800 "$@" ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
