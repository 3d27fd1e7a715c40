#!/usr/bin/env bash
# Supervised-restart wrapper for long TPU runs.
#
# Pairs with the stall watchdog (fhpe_tpu/utils/watchdog.py, knob
# TPU.STALL_TIMEOUT_S): when the watchdog detects a hung device
# transport it force-exits 86 after flushing pending checkpoint writes;
# this wrapper waits for the relay to answer a bounded health probe,
# then restarts the SAME command — AUTO_RESUME restores the last rolling
# checkpoint, so at most TRAIN.CKPT_FREQ eval-epochs are redone.
#
# Usage: scripts/soak/supervise.sh <max_restarts> <cmd...>
# Any exit code other than 86 (success, real crash, SIGTERM) ends the
# loop immediately and is propagated.
set -u
MAX_RESTARTS=${1:?usage: supervise.sh <max_restarts> <cmd...>}; shift

# Pin the run-dir suffix so every restart resumes the SAME run dir
# (create_logger honors FHPE_RUN_TAG; without it each launch gets a new
# timestamped dir and AUTO_RESUME finds nothing).
export FHPE_RUN_TAG=${FHPE_RUN_TAG:-$(date +%Y-%m-%d-%H-%M)}

relay_ok() {
  PYTHONPATH=/root/.axon_site:${PYTHONPATH:-/root/repo} timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
" >/dev/null 2>&1
}

attempt=0
while :; do
  "$@"
  rc=$?
  if [ "$rc" -ne 86 ]; then
    exit "$rc"
  fi
  attempt=$((attempt + 1))
  if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
    echo "supervise: stall-restart budget exhausted ($MAX_RESTARTS)" >&2
    exit 86
  fi
  echo "supervise: run stalled (exit 86); waiting for relay health" \
       "(restart $attempt/$MAX_RESTARTS)" >&2
  until relay_ok; do
    echo "supervise: relay still down; sleeping 120s" >&2
    sleep 120
  done
  echo "supervise: relay healthy; restarting" >&2
done
