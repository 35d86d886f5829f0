#!/bin/bash
# One-shot TPU measurement battery for the throughput hunt (VERDICT r1 #1).
# Run when the axon tunnel is alive; each step is serialized (1-CPU host)
# and logged to perf_logs/. Safe to re-run — compiles hit .jax_cache.
set -u
cd "$(dirname "$0")"
mkdir -p perf_logs
probe() {
  # cold backend init alone can take ~35 s through the tunnel
  timeout 120 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" \
    >/dev/null 2>&1
}
if ! probe; then echo "TPU tunnel DOWN — aborting"; exit 1; fi
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" >"perf_logs/$name.log" 2>&1
  echo "rc=$? (tail:)"; grep -v cpu_aot "perf_logs/$name.log" | tail -6
}
run bench_baseline      2700 python bench.py
# continuity with BENCH_r01 (rodent_new) — same dims as rodent_optimized
BRR_BENCH_MODEL=rodent_new.xml run bench_rodent_new 2700 python bench.py
run prof_raw             900 python profile_controlstep.py --only raw
run prof_pipe            900 python profile_controlstep.py --only pipe
run prof_lean            900 python profile_controlstep.py --only lean
run prof_bench           900 python profile_controlstep.py --only bench
run ablate_none          700 python profile_kernel.py
run ablate_chol          700 python profile_kernel.py --ablate chol
run ablate_cg            700 python profile_kernel.py --ablate cg
run ablate_ls            700 python profile_kernel.py --ablate ls
run ablate_damp          700 python profile_kernel.py --ablate damp
BRR_FF_LANES=256 run bench_lanes256 1800 python bench.py
# parallel line search: 1 batched phi' eval + secant + 2 Newton polish
# instead of 7 sequential Newton refinements per CG iteration
BRR_LS_PAR=1 run bench_lspar 1800 python bench.py
BRR_LS_PAR=1 BRR_FF_LANES=256 run bench_lspar_lanes256 1800 python bench.py
# 512 lanes: 4x independent instructions per dependent step; ~39 MB of
# (np_,np_,512) f32 scratch per buffer — may exceed VMEM, failure is data
BRR_FF_LANES=512 run bench_lanes512 1800 python bench.py
# on-chip numerics gate: fused-Mosaic and XLA-stage paths vs the CPU golden
run golden_fused        1200 python tpu_golden_check.py
BRR_NO_FUSED=1 run golden_stage 1800 python tpu_golden_check.py
# config 5 single-chip leg: nv=146 pair model under real Mosaic
BRR_BENCH_MODEL=rodent_pair.xml BRR_BENCH_ENVS=1024 \
  run bench_pair        2700 python bench.py
echo "=== done — see perf_logs/ ==="
