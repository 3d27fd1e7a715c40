#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train --cfg experiments/coco/hourglass/hg4_128_256x192.yaml "$@"
