#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train --cfg experiments/mpii/hrnet/w32_256x256.yaml "$@"
