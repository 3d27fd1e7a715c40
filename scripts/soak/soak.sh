#!/usr/bin/env bash
# Generalization soak to plateau (docs/STATUS_R3.md): hourglass s4/f128 on
# the 2048-sample synthetic db with FULL augmentation, validated on the
# held-out 1024-sample split (different generator seed).  Round-2 ran 15
# epochs (val PCK 0.114 -> 0.323, still rising); this runs to a documented
# plateau with the decode cache keeping the 1-core host out of the way.
set -e
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
exec python -m fhpe_tpu.cli.train \
  --cfg experiments/mpii/hourglass/hg4_128_student.yaml \
  DATASET.DATASET synthetic DATASET.ROOT /tmp/fhpe_soak \
  DATASET.SYNTH_SIZE 2048 \
  TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.LR 2.5e-4 TRAIN.LR_STEP 90,110 \
  TRAIN.END_EPOCH 130 TRAIN.EVAL_FREQ 2 TRAIN.CKPT_FREQ 5 \
  TEST.BATCH_SIZE_PER_GPU 128 TEST.FLIP_TEST False \
  TPU.DECODE_CACHE_MB 2048 TPU.NATIVE_DECODE True \
  OUTPUT_DIR output/soak LOG_DIR log/soak \
  TPU.STALL_TIMEOUT_S 1800 DEBUG.DEBUG False PRINT_FREQ 16 "$@"
