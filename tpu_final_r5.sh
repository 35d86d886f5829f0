#!/bin/bash
# Round-5 TPU queue, v2 (post-golden reality): the fused kernel FAILS
# its on-chip gate at HEAD defaults (kerr 25.8 vs 5e-3 — r5_golden.log),
# so value order is now:
#  1. learn    — config-3 learning run on the ORACLE-VERIFIED stage
#                path (BRR_NO_FUSED=1 inside run_config3.sh), resumable
#                across tunnel windows. The #1 deliverable, 3 rounds due.
#  2. bisect   — section-level kernel miscompile localization
#                (tpu_kernel_bisect.py): default flags first, then the
#                flag ladder. One substep => the first diverging output
#                names the guilty section.
#  3. bench    — gated headline (falls to the stage rung honestly).
#  4. pair / ab / mosaic — after the above.
# Each step is resumable: a .done marker skips it on requeue.
set -u
cd "$(dirname "$0")"
mkdir -p perf_logs runs
probe() {
  # ONE quick attempt: with per-step probes a 3x120s retry makes a
  # full down-tunnel cycle ~40 min, so the step tried first after the
  # tunnel returns is effectively random - breaking the value order
  timeout 90 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1
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
  run r5_learn    3300 bash run_config3.sh 30000000 2048
  # outer-loop qpos carry 8-alignment fix landed: the n10 gate is the
  # decisive check; bisects only matter if it still fails
  run r5_golden2  2400 python tpu_golden_check.py
  run r5_bench    3600 python bench.py
  grep -q '"value": [0-9]' perf_logs/r5_bench.log 2>/dev/null \
    && touch perf_logs/.done_r5_bench
  run r5_pair     2400 env BRR_BENCH_MODEL=rodent_pair.xml BRR_BENCH_ENVS=1024 python bench.py
  # trained-policy artifact: side-by-side pair video from the learning
  # run's final checkpoint (VERDICT r4 missing #4)
  if [ -f runs/ckpts/config3_2048env_30000000/final ] \
     && [ ! -f perf_logs/.done_r5_video ]; then
    run r5_video  1800 env BRR_NO_FUSED=1 python render_rollout.py \
      --params runs/ckpts/config3_2048env_30000000/final \
      --steps 250 --out runs/eval_video env.model_xml=rodent_optimized.xml
  fi
  # epoch_scan on-chip A/B (VERDICT r4 #9): short training runs, same
  # shape, scan on vs off; compare training/sps in the two metrics files
  if [ -f perf_logs/.done_r5_learn ]; then
    run r5_es_off 1600 env BRR_NO_FUSED=1 python train_rodent.py \
      env.model_xml=rodent_optimized.xml ppo.num_timesteps=2000000 \
      ppo.num_envs=2048 ppo.num_evals=2 run.render_video=false \
      run.log_wandb=false run.run_name=es_off run.logdir=runs \
      run.checkpoint_dir=runs/ckpts
    run r5_es_on  1600 env BRR_NO_FUSED=1 python train_rodent.py \
      env.model_xml=rodent_optimized.xml ppo.num_timesteps=2000000 \
      ppo.num_envs=2048 ppo.num_evals=2 ppo.epoch_scan=true \
      run.render_video=false run.log_wandb=false run.run_name=es_on \
      run.logdir=runs run.checkpoint_dir=runs/ckpts
  fi
  run r5_mosaic   2400 python dump_mosaic.py --out perf_logs/mosaic_dump.txt
  # lever A/Bs only make sense once the kernel passes its gate
  if [ -f perf_logs/.done_r5_golden2 ]; then
    run r5_ab_tree 3600 python tpu_interleave_ab.py tree '{"BRR_CHOL_TREE":"1"}' dense '{}' --reps 3
    run r5_ab_ls   3600 python tpu_interleave_ab.py lspar '{}' lsseq '{"BRR_LS_SEQ":"1"}' --reps 3
  fi
  if [ ! -f perf_logs/.done_r5_golden2 ]; then
    run r5_bisect_default 2400 python tpu_kernel_bisect.py
    run r5_bisect_n10     2400 python tpu_kernel_bisect.py --n-frames 10
  fi
  if [ -f perf_logs/.done_r5_learn ] && [ -f perf_logs/.done_r5_bench ]; then
    echo CORE DONE
    [ -f perf_logs/.done_r5_pair ] && [ -f perf_logs/.done_r5_mosaic ] \
      && { echo ALL DONE; exit 0; }
  fi
  sleep 120
done
