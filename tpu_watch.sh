#!/bin/bash
# Tunnel watcher: probe the axon TPU every ~4 min; when it answers, run
# the queued on-chip work in value order, one stage per uptime window.
# Stamp files in perf_logs/ make restarts resume instead of redo.
# Usage: ./tpu_watch.sh [max_hours]
set -u
cd "$(dirname "$0")"
mkdir -p perf_logs runs
MAX_S=$(( ${1:-8} * 3600 ))
T0=$(date +%s)
probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1
}
log() { echo "[watch $(date -u +%H:%M:%S)] $*"; }
while :; do
  now=$(date +%s)
  [ $((now - T0)) -ge "$MAX_S" ] && { log "window over"; exit 0; }
  if [ -f perf_logs/.done_sweep ] && [ -f perf_logs/.done_learn ]; then
    log "all stages done"; exit 0
  fi
  if probe; then
    log "tunnel UP"
    if [ ! -f perf_logs/.done_sweep ]; then
      log "running tpu_sweep.sh"
      if bash tpu_sweep.sh >> perf_logs_sweep_r4.log 2>&1; then
        touch perf_logs/.done_sweep
      fi
      # partial progress still counts: if the headline bench + golden
      # landed (ok true OR an honest failure verdict), don't redo the
      # whole battery on the next uptime window
      if grep -q '"value": [0-9]' perf_logs/bench_baseline.log 2>/dev/null \
         && grep -q '"kernel_vs_stage_err"' perf_logs/golden_default.log \
              2>/dev/null; then
        touch perf_logs/.done_sweep
      fi
      continue
    fi
    if [ ! -f perf_logs/.done_learn ]; then
      log "running config-3 learning run"
      if bash run_config3.sh 50000000 2048 >> perf_logs/learn_watch.log 2>&1
      then
        touch perf_logs/.done_learn
      fi
      continue
    fi
  else
    log "tunnel down"
  fi
  sleep 230
done
