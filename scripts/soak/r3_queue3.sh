#!/usr/bin/env bash
# Round-3 TPU work queue #3: waits for queue #2 (second-seed FPD A/B),
# then runs the synthetic-COCO overfit — COCO AP driven to its
# memorization ceiling through the real evaluator stack.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "=== [$(date +%H:%M:%S)] waiting for pid $WAIT_PID (queue #2) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== [$(date +%H:%M:%S)] stage coco_overfit start ==="
timeout 10800 scripts/soak/coco_overfit.sh \
  >"log/r3_queue/coco_overfit.log" 2>&1
echo "=== [$(date +%H:%M:%S)] stage coco_overfit done rc=$? ==="
echo "=== queue #3 complete ==="
