#!/usr/bin/env bash
# Round-3 TPU work queue #5: the relay died mid-queue-#2 (second-seed KD
# run hung at epoch 119 with the plateau already measured; queues #3/#4
# never started).  This runner GATES on relay health — a 120s-bounded
# jax.devices() probe — so the COCO-overfit and bench stages don't burn
# their timeout windows against a dead relay, then runs them in order.
# Logs under log/r3_queue/.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

relay_ok() {
  PYTHONPATH=/root/.axon_site:/root/repo timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
print('relay ok:', jax.devices())
" >>log/r3_queue/relay_probe.log 2>&1
}

echo "=== [$(date +%H:%M:%S)] waiting for relay ==="
until relay_ok; do
  echo "=== [$(date +%H:%M:%S)] relay still down; sleeping 120s ==="
  sleep 120
done
echo "=== [$(date +%H:%M:%S)] relay healthy ==="

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name start ==="
  timeout "$tmo" "$@" >"log/r3_queue/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$? ==="
}

stage coco_overfit 14400 scripts/soak/supervise.sh 4 \
  scripts/soak/coco_overfit.sh \
  AUTO_RESUME True TPU.STALL_TIMEOUT_S 1800
stage bench_r3 3600 python bench.py
echo "=== queue #5 complete ==="
