#!/usr/bin/env bash
# Train the plain (no-KD) hourglass student (stacks=4, feats=128) on MPII.
set -e
cd "$(dirname "$0")/../.."
python -m fhpe_tpu.cli.train \
    --cfg experiments/mpii/hourglass/hg4_128_student.yaml "$@"
