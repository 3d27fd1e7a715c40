#!/usr/bin/env bash
# One-shot environment preparation (the reference's prepare_env.sh analogue):
# builds the native NMS library, verifies imports, and links dataset dirs.
set -e
cd "$(dirname "$0")"

echo "=> building native NMS library"
make -C fhpe_tpu/ops/cpp

echo "=> verifying package imports and backends"
python - <<'PY'
import jax
import fhpe_tpu
from fhpe_tpu.ops import native
print("jax", jax.__version__, "devices:", jax.devices())
print("native NMS available:", native.available())
PY

# Optional dataset layout (mirrors the reference):
#   data/mpii/annot/{train,valid}.json + gt_valid.mat, data/mpii/images/
#   data/coco/annotations/person_keypoints_{train2017,val2017}.json,
#   data/coco/images/{train2017,val2017}/, person_detection_results/
mkdir -p data models output log
echo "=> done. Put datasets under ./data (see comment above) or run with"
echo "   DATASET.DATASET synthetic for a hermetic smoke train."
