#!/bin/bash
# Waits for the axon TPU tunnel to answer, then fires the full measurement
# battery (tpu_sweep.sh). Progress -> .tpu_watch.log; sweep logs -> perf_logs/.
cd /root/repo
mkdir -p perf_logs
while true; do
  if timeout 60 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "TPU ALIVE at $(date -u +%H:%M:%S) — launching tpu_sweep.sh" >> .tpu_watch.log
    ./tpu_sweep.sh >> perf_logs/sweep_driver.log 2>&1
    echo "SWEEP DONE rc=$? at $(date -u +%H:%M:%S)" >> .tpu_watch.log
    exit 0
  fi
  echo "down $(date -u +%H:%M:%S) (autorun)" >> .tpu_watch.log
  sleep 240
done
