#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.test \
    --cfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml "$@"
