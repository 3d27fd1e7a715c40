#!/usr/bin/env bash
# Round-3 TPU work queue #6: runs after queue #5 (COCO overfit + bench).
# Measures the end-to-end FPD CLI speed AFTER the one-time teacher
# device_put fix (cli/fpd_train.py): the round-3 A/B KD runs crawled at
# 7-16 samples/s because the msgpack-restored numpy teacher (~100 MB)
# was re-uploaded through the relay on EVERY step; plain students ran
# 55-92.  This short KD run (same config/phase as fpd_ab.sh kd) gives
# the after-fix steady-state Speed lines for BENCH_NOTES.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

# Wait for queue #5 to finish (it owns the chip until then).
if [ -f /tmp/r3_queue5.pid ]; then
  Q5=$(cat /tmp/r3_queue5.pid)
  while kill -0 "$Q5" 2>/dev/null; do sleep 60; done
fi

relay_ok() {
  PYTHONPATH=/root/.axon_site:/root/repo timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
print('relay ok:', jax.devices())
" >>log/r3_queue/relay_probe.log 2>&1
}

echo "=== [$(date +%H:%M:%S)] queue6: waiting for relay ==="
until relay_ok; do
  echo "=== [$(date +%H:%M:%S)] relay still down; sleeping 120s ==="
  sleep 120
done
echo "=== [$(date +%H:%M:%S)] relay healthy ==="

echo "=== [$(date +%H:%M:%S)] stage kd_speed start ==="
timeout 5400 scripts/soak/fpd_ab.sh kd \
  TRAIN.END_EPOCH 30 TRAIN.EVAL_FREQ 50 TRAIN.CKPT_FREQ 50 \
  PRINT_FREQ 4 OUTPUT_DIR output/fpd_speed LOG_DIR log/fpd_speed \
  >log/r3_queue/kd_speed.log 2>&1
echo "=== [$(date +%H:%M:%S)] stage kd_speed done rc=$? ==="
grep -o "Speed [0-9.]* samples/s" output/fpd_speed/synthetic/hourglass/*/running.log | tail -12
echo "=== queue #6 complete ==="
