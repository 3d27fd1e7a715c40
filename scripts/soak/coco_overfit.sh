#!/usr/bin/env bash
# COCO-stack convergence proof (docs/STATUS_R3.md): overfit a 128-image
# SYNTHETIC COCO-FORMAT dataset (fhpe_tpu.data.make_synthetic_coco) and
# drive **COCO AP** — not the PCK proxy — to ~1.0 through the REAL
# pipeline: build_gt_db -> augment/warp -> train -> decode -> rescoring ->
# OKS-NMS -> results JSON -> CocoKeypointEval.  The MPII-style overfits
# prove targets/loss/decode; this additionally proves the COCO evaluator
# stack on a trained model (reference capability: lib/dataset/coco.py:302-458
# + README.md:55-57).  Validates on the train set (memorization ceiling).
#
# Usage: scripts/soak/coco_overfit.sh [extra KEY VALUE ...]
set -e
cd "$(dirname "$0")/../.."
ROOT=/tmp/fhpe_syncoco
SET=synval2017

python - <<PY
from fhpe_tpu.data import make_synthetic_coco
print(make_synthetic_coco("$ROOT", "$SET", num_images=128,
                          image_hw=(256, 192)))
PY

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
exec python -m fhpe_tpu.cli.train \
  --cfg experiments/coco/hourglass/hg4_256x192_d256x3_adam_lr2.5e-4.yaml \
  DATASET.ROOT "$ROOT" DATASET.TRAIN_SET "$SET" DATASET.TEST_SET "$SET" \
  DATASET.CACHE_ROOT "" \
  DATASET.SCALE_FACTOR 0.0 DATASET.ROT_FACTOR 0 DATASET.FLIP False \
  DATASET.PROB_HALF_BODY 0.0 DATASET.SELECT_DATA False \
  TEST.USE_GT_BBOX True TEST.FLIP_TEST False \
  TRAIN.BATCH_SIZE_PER_GPU 64 TRAIN.LR 2.5e-4 \
  TRAIN.END_EPOCH 400 TRAIN.LR_STEP 320,370 \
  TRAIN.EVAL_FREQ 20 TRAIN.CKPT_FREQ 5 \
  TEST.BATCH_SIZE_PER_GPU 128 \
  TPU.DECODE_CACHE_MB 1024 \
  OUTPUT_DIR output/coco_overfit LOG_DIR log/coco_overfit \
  DEBUG.DEBUG False PRINT_FREQ 100 "$@"
