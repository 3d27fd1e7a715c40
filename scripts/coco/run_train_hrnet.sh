#!/usr/bin/env bash
# HRNet-W32 on COCO (teacher variant: pass the w48 yaml instead).
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train --cfg experiments/coco/hrnet/w32_256x192.yaml "$@"
