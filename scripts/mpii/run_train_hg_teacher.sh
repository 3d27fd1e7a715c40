#!/usr/bin/env bash
# Train the stacked-hourglass teacher (stacks=8, feats=256) on MPII.
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train \
    --cfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml "$@"
