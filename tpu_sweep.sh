#!/bin/bash
# One-shot TPU measurement battery for the throughput hunt.
# Run when the axon tunnel is alive; each step is serialized (1-CPU host)
# and logged to perf_logs/. Safe to re-run — compiles hit .jax_cache.
#
# Defaults under test: parallel line search (BRR_LS_SEQ=1 reverts)
# with dense blocked Cholesky.
set -u
cd "$(dirname "$0")"
mkdir -p perf_logs
probe() {
  # cold backend init alone can take ~35 s through the tunnel, and a
  # single client handshake can hang transiently while the chip is fine
  # (r4: probes failed between two successful rungs) — retry 3x
  local i
  for i in 1 2 3; do
    timeout 120 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" \
      >/dev/null 2>&1 && return 0
  done
  return 1
}
if ! probe; then echo "TPU tunnel DOWN — aborting"; exit 1; fi
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  # re-probe per rung: the tunnel dies mid-battery for hours at a time;
  # skipping beats burning each rung's full timeout against a dead chip
  if ! probe; then echo "SKIP $name (tunnel down)"; return 1; fi
  timeout "$to" "$@" >"perf_logs/$name.log" 2>&1
  echo "rc=$? (tail:)"; grep -v cpu_aot "perf_logs/$name.log" | tail -6
}
# headline: dense blocked chol + parallel LS (round-4 defaults);
# generous leash for a cold Mosaic compile
run bench_baseline      3600 python bench.py
# on-chip numerics gate for the new defaults FIRST (an unreliable
# tunnel must not leave the defaults unvalidated): batched-kernel-vs-
# stage (the REAL Mosaic gate) + the golden trajectory trend
run golden_default      1800 python tpu_golden_check.py
# A/B the parallel-LS default in isolation
BRR_LS_SEQ=1     run bench_seq_ls     1800 python bench.py
# unpaired factor passes (halves factor-scratch VMEM; paired saves op
# issue overhead now that the sparse sections are op-count-dominated)
BRR_CHOL_SPLIT=1 run bench_split      1800 python bench.py
# kernel-section ablations under the new defaults
run ablate_none          700 python profile_kernel.py
run ablate_chol          700 python profile_kernel.py --ablate chol
run ablate_cg            700 python profile_kernel.py --ablate cg
run ablate_ls            700 python profile_kernel.py --ablate ls
run ablate_damp          700 python profile_kernel.py --ablate damp
# lane widening: r4 found lanes-256 OOMs on register SPILL slots
# (~104 MB); sparse LDL shrinks the live set — retry both ways
BRR_FF_LANES=256                  run bench_lanes256       1800 python bench.py
BRR_FF_LANES=256 BRR_CHOL_SPLIT=1 run bench_lanes256_split 1800 python bench.py
# numerics gate under the round-3 flags (kernel-vs-stage baseline)
BRR_LS_SEQ=1 run golden_r3flags 1800 python tpu_golden_check.py
# config 5 single-chip leg: nv=146 pair model under real Mosaic
BRR_BENCH_MODEL=rodent_pair.xml BRR_BENCH_ENVS=1024 \
  run bench_pair        2700 python bench.py
echo "=== done — see perf_logs/ ==="
