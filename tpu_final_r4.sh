#!/bin/bash
# Round-4 endgame queue: essentials only, in value order.
set -u
cd "$(dirname "$0")"
mkdir -p perf_logs runs
probe() {
  local i
  for i in 1 2 3; do
    timeout 120 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1 \
      && return 0
  done
  return 1
}
run() {
  local name=$1 to=$2; shift 2
  [ -f "perf_logs/.done_$name" ] && return 0
  echo "=== $name $(date -u +%H:%M:%S) ==="
  if ! probe; then echo "SKIP $name (tunnel down)"; return 1; fi
  if timeout "$to" "$@" >"perf_logs/$name.log" 2>&1; then
    touch "perf_logs/.done_$name"
  fi
  echo "rc=$? (tail:)"; tail -3 "perf_logs/$name.log"
}
while :; do
  run final_bench   3600 python bench.py
  # count an honest JSON value as done even if a later rung failed
  grep -q '"value": [0-9]' perf_logs/final_bench.log 2>/dev/null \
    && touch perf_logs/.done_final_bench
  run final_golden  1800 python tpu_golden_check.py
  run final_lanes256 2400 env BRR_FF_LANES=256 BRR_CHOL_SPLIT=1 python bench.py
  run final_learn   3000 bash run_config3.sh 30000000 2048
  run final_pair    2400 env BRR_BENCH_MODEL=rodent_pair.xml BRR_BENCH_ENVS=1024 python bench.py
  if [ -f perf_logs/.done_final_bench ] && [ -f perf_logs/.done_final_learn ]; then
    echo ALL DONE; exit 0
  fi
  sleep 180
done
