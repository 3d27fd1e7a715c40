#!/usr/bin/env bash
# Round-3 TPU work queue #4: after queue #3 (COCO overfit), run bench.py
# once to validate the flagship number for STATUS (the driver runs its
# own bench at round end; this is an early sanity check).
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "=== [$(date +%H:%M:%S)] waiting for pid $WAIT_PID (queue #3) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [$(date +%H:%M:%S)] stage bench start ==="
timeout 3600 python bench.py >"log/r3_queue/bench_r3.log" 2>&1
echo "=== [$(date +%H:%M:%S)] stage bench done rc=$? ==="
echo "=== queue #4 complete ==="
