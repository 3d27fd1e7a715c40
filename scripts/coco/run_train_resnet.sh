#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train --cfg experiments/coco/resnet/res50_256x192.yaml "$@"
