#!/usr/bin/env bash
# Overfit-to-saturation convergence proof (docs/STATUS_R3.md).
#
# Trains one backbone on a FIXED 256-sample synthetic db with augmentation
# off, validating on the SAME db (DATASET.SYNTH_OVERFIT): a correct
# targets/loss/decode/LR pipeline must drive val PCK to ~1.0; any subtle
# bug caps it.  This is the strongest convergence evidence available
# without real MPII/COCO data (reference capability:
# lib/core/function.py:28-96 training to README.md:36-39 accuracies).
#
# Usage: scripts/soak/overfit.sh {hg4|w32|res50} [extra KEY VALUE ...]
set -e
cd "$(dirname "$0")/../.."
FAMILY=${1:?"usage: overfit.sh hg4|w32|res50"}
shift || true

COMMON=(
  DATASET.DATASET synthetic DATASET.ROOT /tmp/fhpe_overfit
  DATASET.SYNTH_SIZE 256 DATASET.SYNTH_OVERFIT True
  DATASET.SCALE_FACTOR 0.0 DATASET.ROT_FACTOR 0 DATASET.FLIP False
  DATASET.PROB_HALF_BODY 0.0
  TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.EVAL_FREQ 10
  TRAIN.END_EPOCH 300 TRAIN.LR_STEP 200,250
  TEST.BATCH_SIZE_PER_GPU 128 TEST.FLIP_TEST False
  TPU.DECODE_CACHE_MB 1024 TPU.NATIVE_DECODE True
  OUTPUT_DIR output/overfit LOG_DIR log/overfit
  DEBUG.DEBUG False PRINT_FREQ 100
)

case "$FAMILY" in
  hg4)   CFG=experiments/mpii/hourglass/hg4_128_student.yaml
         EXTRA=(TRAIN.LR 2.5e-4) ;;
  w32)   CFG=experiments/mpii/hrnet/w32_256x256_adam_lr1e-3.yaml
         EXTRA=(TRAIN.LR 1e-3) ;;
  res50) CFG=experiments/mpii/resnet/res50_256x256_d256x3_adam_lr1e-3.yaml
         EXTRA=(TRAIN.LR 1e-3) ;;
  *) echo "unknown family $FAMILY"; exit 2 ;;
esac

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
exec python -m fhpe_tpu.cli.train --cfg "$CFG" "${COMMON[@]}" "${EXTRA[@]}" \
  TPU.STALL_TIMEOUT_S 1800 "$@"
