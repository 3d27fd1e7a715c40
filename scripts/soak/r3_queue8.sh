#!/usr/bin/env bash
# Round-3 TPU work queue #8: after queue #7 (serving bench), run the
# MPII-format overfit — PCKh@0.5 driven to its memorization ceiling
# through the real gt_<set>.mat evaluator (twin of the COCO AP proof).
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

if [ -f /tmp/r3_queue7.pid ]; then
  Q7=$(cat /tmp/r3_queue7.pid)
  while kill -0 "$Q7" 2>/dev/null; do sleep 60; done
fi

echo "=== [$(date +%H:%M:%S)] stage mpii_overfit start ==="
timeout 14400 scripts/soak/supervise.sh 4 \
  scripts/soak/mpii_overfit.sh \
  AUTO_RESUME True TPU.STALL_TIMEOUT_S 1800 \
  >log/r3_queue/mpii_overfit.log 2>&1
echo "=== [$(date +%H:%M:%S)] stage mpii_overfit done rc=$? ==="
grep "Mean |" $(ls -t output/mpii_overfit/mpii/hourglass/*/running.log 2>/dev/null | head -1) 2>/dev/null | tail -4
echo "=== queue #8 complete ==="
