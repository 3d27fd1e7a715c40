#!/usr/bin/env bash
# Round-3 TPU work queue (docs/STATUS_R3.md pending items), serialized on
# the single relay chip:
#   1. dead-bias A/B probe           (VERDICT r2 task #5)
#   2. FPD efficacy A/B teacher      (VERDICT r2 task #2)
#   3. FPD efficacy A/B plain student
#   4. FPD efficacy A/B kd student
#   5. generalization soak to plateau
# Logs under log/r3_queue/.  Each stage is bounded by `timeout`.
set -u
cd "$(dirname "$0")/../.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
mkdir -p log/r3_queue

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name start ==="
  timeout "$tmo" "$@" >"log/r3_queue/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name done rc=$rc ==="
}

stage dead_bias 3600 env PYTHONPATH=/root/.axon_site:/root/repo \
  python scripts/probe/dead_bias_ab.py
stage teacher  10800 scripts/soak/fpd_ab.sh teacher
stage plain     7200 scripts/soak/fpd_ab.sh plain
stage kd        9000 scripts/soak/fpd_ab.sh kd
stage soak     10800 scripts/soak/soak.sh
echo "=== queue complete ==="
