#!/bin/bash
# Round-5 TPU queue: value order per VERDICT r4.
#  1. golden  — heterogeneous kernel-vs-stage gate + highest-precision
#               golden trajectory (VERDICT #1/#7). Everything else is
#               meaningless if this fails.
#  2. bench   — gated headline (rungs now refuse on numerics failure).
#  3. learn   — config-3 learning run, 30M steps x 2048 envs (#4).
#  4. pair    — rodent_pair on-chip number (#5).
#  5. ab_ls   — interleaved parallel-vs-sequential LS A/B, 3 reps (#6).
#  6. mosaic  — Mosaic MLIR dump for the measured perf model (#3).
# Each step is resumable: a .done marker skips it on requeue.
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
  run r5_golden   2400 python tpu_golden_check.py
  run r5_bench    3600 python bench.py
  grep -q '"value": [0-9]' perf_logs/r5_bench.log 2>/dev/null \
    && touch perf_logs/.done_r5_bench
  run r5_learn    3300 bash run_config3.sh 30000000 2048
  run r5_pair     2400 env BRR_BENCH_MODEL=rodent_pair.xml BRR_BENCH_ENVS=1024 python bench.py
  run r5_ab_ls    3600 python tpu_interleave_ab.py lspar '{}' lsseq '{"BRR_LS_SEQ":"1"}' --reps 3
  run r5_mosaic   2400 python dump_mosaic.py --out perf_logs/mosaic_dump.txt
  if [ -f perf_logs/.done_r5_golden ] && [ -f perf_logs/.done_r5_bench ] \
     && [ -f perf_logs/.done_r5_learn ]; then
    echo CORE DONE
    [ -f perf_logs/.done_r5_pair ] && [ -f perf_logs/.done_r5_ab_ls ] \
      && [ -f perf_logs/.done_r5_mosaic ] && { echo ALL DONE; exit 0; }
  fi
  sleep 180
done
