#!/usr/bin/env bash
# Round-3 TPU work queue #2: waits for the first queue (r3_queue.sh) to
# release the chip, then runs a SECOND-SEED replica of the FPD efficacy
# A/B (TRAIN.SEED 1: fresh init, augmentation, and shuffle streams; same
# teacher, data, and step budget) — one-seed deltas can be luck, two
# independent seeds showing the same KD gain are evidence.
# Logs under log/r3_queue/.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "=== [$(date +%H:%M:%S)] waiting for pid $WAIT_PID (queue #1) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name start ==="
  timeout "$tmo" "$@" >"log/r3_queue/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc ==="
}

stage plain_s1 7200 scripts/soak/fpd_ab.sh plain \
  TRAIN.SEED 1 OUTPUT_DIR output/fpd_ab_plain_s1
stage kd_s1    9000 scripts/soak/fpd_ab.sh kd \
  TRAIN.SEED 1 OUTPUT_DIR output/fpd_ab_kd_s1
echo "=== queue #2 complete ==="
