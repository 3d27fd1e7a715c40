#!/usr/bin/env bash
# Round-3 TPU work queue #9: after queue #8 (MPII overfit), re-measure
# the FPD CLI end-to-end speed AFTER the one-time teacher device_put fix.
# The original teacher checkpoint was lost to the box restart; throughput
# is architecture-dependent only, so a random-init hg8 teacher
# (output/fpd_ab/.../rand_teacher_speed/final_state.msgpack, saved on
# CPU) stands in.  Before-fix: KD runs crawled at 7-16 samples/s from
# re-uploading the ~100 MB numpy teacher every step; plain ran 55-92.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

if [ -f /tmp/r3_queue8.pid ]; then
  Q8=$(cat /tmp/r3_queue8.pid)
  while kill -0 "$Q8" 2>/dev/null; do sleep 60; done
fi

echo "=== [$(date +%H:%M:%S)] stage kd_speed start ==="
timeout 5400 scripts/soak/fpd_ab.sh kd \
  TRAIN.END_EPOCH 30 TRAIN.EVAL_FREQ 50 TRAIN.CKPT_FREQ 50 \
  PRINT_FREQ 4 OUTPUT_DIR output/fpd_speed LOG_DIR log/fpd_speed \
  >log/r3_queue/kd_speed.log 2>&1
echo "=== [$(date +%H:%M:%S)] stage kd_speed done rc=$? ==="
grep -o "Speed [0-9.]* samples/s" output/fpd_speed/synthetic/hourglass/*/running.log 2>/dev/null | tail -12
echo "=== queue #9 complete ==="
