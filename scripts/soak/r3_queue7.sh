#!/usr/bin/env bash
# Round-3 TPU work queue #7: serving-path latency/throughput on the real
# chip (fhpe_tpu.serve.Predictor, scripts/probe/serve_bench.py) — the
# hourglass flagship and HRNet-W32, flip-test off and on.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

if [ -f /tmp/r3_queue6.pid ]; then
  Q6=$(cat /tmp/r3_queue6.pid)
  while kill -0 "$Q6" 2>/dev/null; do sleep 60; done
fi

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name start ==="
  timeout "$tmo" "$@" >"log/r3_queue/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$? ==="
}

stage serve_hg 2400 python scripts/probe/serve_bench.py \
  --cfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml --batch 64
stage serve_hg_flip 2400 python scripts/probe/serve_bench.py \
  --cfg experiments/mpii/hourglass/hg8_256x256_teacher.yaml --batch 64 --flip
stage serve_w32 2400 python scripts/probe/serve_bench.py \
  --cfg experiments/mpii/hrnet/w32_256x256_adam_lr1e-3.yaml --batch 64
stage serve_w32_flip 2400 python scripts/probe/serve_bench.py \
  --cfg experiments/mpii/hrnet/w32_256x256_adam_lr1e-3.yaml --batch 64 --flip
echo "=== queue #7 complete ==="
