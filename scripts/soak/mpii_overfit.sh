#!/usr/bin/env bash
# MPII-stack convergence proof (docs/STATUS_R3.md): overfit a 128-image
# SYNTHETIC MPII-FORMAT dataset (fhpe_tpu.data.make_synthetic_mpii) and
# drive **PCKh@0.5** — the reference's headline MPII metric — to 100
# through the REAL pipeline: mpii.build_db -> augment/warp -> train ->
# decode -> pred.mat -> evaluate() against gt_<set>.mat.  The COCO twin
# (coco_overfit.sh) proves the AP stack; this proves the PCKh stack on a
# trained model (reference capability: lib/dataset/mpii.py:56-194 +
# README.md:36-39).  Validates on the train set (memorization ceiling).
#
# Usage: scripts/soak/mpii_overfit.sh [extra KEY VALUE ...]
set -e
cd "$(dirname "$0")/../.."
ROOT=/tmp/fhpe_synmpii
SET=synval

python - <<PY
from fhpe_tpu.data import make_synthetic_mpii
print(make_synthetic_mpii("$ROOT", "$SET", num_images=128,
                          image_hw=(256, 256)))
PY

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
exec python -m fhpe_tpu.cli.train \
  --cfg experiments/mpii/hourglass/hg4_256x256_d256x3_adam_lr2.5e-4.yaml \
  DATASET.ROOT "$ROOT" DATASET.TRAIN_SET "$SET" DATASET.TEST_SET "$SET" \
  DATASET.CACHE_ROOT "" \
  DATASET.SCALE_FACTOR 0.0 DATASET.ROT_FACTOR 0 DATASET.FLIP False \
  DATASET.PROB_HALF_BODY 0.0 DATASET.SELECT_DATA False \
  TEST.FLIP_TEST False \
  TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.LR 2.5e-4 \
  TRAIN.END_EPOCH 400 TRAIN.LR_STEP 320,370 \
  TRAIN.EVAL_FREQ 20 TRAIN.CKPT_FREQ 5 \
  TEST.BATCH_SIZE_PER_GPU 128 \
  TPU.DECODE_CACHE_MB 1024 \
  OUTPUT_DIR output/mpii_overfit LOG_DIR log/mpii_overfit \
  DEBUG.DEBUG False PRINT_FREQ 100 "$@"
