"""Headline benchmark: batched Rodent env-steps/s on one chip.

Config 3 of BASELINE.json: rodent model + run task, num_envs=2048, single
chip, training-wrapped env (EpisodeWrapper 150 + Vmap + AutoReset — the
stepping path PPO actually pays for). Each env step = 10 physics substeps at
dt=0.002 (Rodent_Env_Brax.py:53-57).

Baseline: the reference never published throughput at scale (SURVEY.md §6).
The proxy we beat: its best single-env jit step rate (84 steps/s,
i7-11700K + A5000, mjcf.ipynb cell 14) scaled perfectly to the A40's
512-env capacity ceiling (readme.md:33) = 43,008 env-steps/s. The driver
target is >=5x that per chip at 2048 envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_ENV_STEPS_PER_S = 512 * 84.0  # see module docstring

_MODELS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def _model_path(name: str) -> str:
  return os.path.join(_MODELS, name)


def main(num_envs: int = 2048, steps_per_block: int = 50,
         blocks: int = 4, model_xml: str = "rodent_optimized.xml") -> None:
  import jax
  # persistent compile cache: the 2048-env program compiles in minutes on
  # this 1-CPU host; driver re-runs should skip straight to execution
  from brax_rodent_run_tpu.utils.cache import configure_cache
  configure_cache(os.path.dirname(os.path.abspath(__file__)))
  import jax.numpy as jnp

  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.envs.rodent import Rodent
  from brax_rodent_run_tpu.envs.wrappers import wrap_for_training

  m = load_model(_model_path(model_xml), solver="cg",
                   iterations=8, ls_iterations=8)

  # ---- correctness gate (VERDICT r4 #1): before timing anything, prove
  # the kernel THIS RUNG will dispatch (same process, same flags)
  # matches the XLA stage pipeline on heterogeneous states. A rung whose
  # kernel computes garbage must not produce a headline number — exit 3
  # so the ladder falls to the next rung with an attributable reason.
  gate_info = {"gate_ok": None}
  if os.environ.get("BRR_NO_FUSED") or os.environ.get("BRR_BENCH_NO_GATE"):
    gate_info = {"gate_ok": None, "gate_skipped": (
        "xla_stage_path" if os.environ.get("BRR_NO_FUSED") else "BRR_BENCH_NO_GATE")}
  else:
    from brax_rodent_run_tpu.ops import gate as _gate
    g = _gate.full_gate(m)
    if g is None:
      gate_info = {"gate_ok": None, "gate_skipped": "model_not_kernel_eligible"}
    else:
      gate_info = {"gate_ok": g["ok"],
                   "gate_seq_err": round(g["seq_err"], 8),
                   "gate_lever_err": (round(g["lever_err"], 8)
                                      if g["lever_err"] is not None
                                      else None),
                   "gate_budgets": [g["seq_budget"], g["lever_budget"]],
                   "gate_states_skipped": g["n_skipped"]}
      if not g["ok"]:
        print(json.dumps({"gate_failed": True, **gate_info}), flush=True)
        raise SystemExit(3)

  track = jnp.asarray(
      np.cumsum(np.tile(np.array([[0.002, 0.0, 0.0]]), (260, 1)), axis=0),
      jnp.float32)
  # the production training path: lean pipeline (no XLA frame/sensor
  # reconstruction after the fused control step) + lean auto-reset
  env = wrap_for_training(
      Rodent(m, track_pos=track, lean_pipeline=True), episode_length=150,
      lean_autoreset=True)

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(env.reset)(rng)

  def block(state, key):
    def one(carry, _):
      state, key = carry
      key, akey = jax.random.split(key)
      action = jax.random.uniform(
          akey, (num_envs, env.action_size), jnp.float32, -0.3, 0.3)
      state = env.step(state, action)
      return (state, key), ()

    (state, key), _ = jax.lax.scan(one, (state, key), (),
                                   length=steps_per_block)
    return state, key

  block = jax.jit(block, donate_argnums=(0,))

  def sync(state):
    # fetch real output data: under the axon tunnel block_until_ready
    # returns before device execution finishes, so a host read of a
    # computed value is the only trustworthy barrier.
    return float(jnp.sum(state.reward))

  key = jax.random.PRNGKey(1)
  # compile + warmup
  state, key = block(state, key)
  sync(state)

  t0 = time.perf_counter()
  for _ in range(blocks):
    state, key = block(state, key)
  sync(state)
  dt = time.perf_counter() - t0

  env_steps = num_envs * steps_per_block * blocks
  steps_per_s = env_steps / dt

  # roofline context (VERDICT r1 #1): analytic EXECUTED-flop model of the
  # fused control step (ops/fused_full.flops_per_env_substep — counts
  # every MAC incl. the zeros of static mask-matmuls). v5e peak: 197
  # TFLOP/s bf16 MXU; the kernel is f32 and heavily VPU-bound, so the
  # pct_peak figure is a trend metric, not a true utilization ceiling.
  from brax_rodent_run_tpu.ops import fused_full as ff
  n_frames = 10
  gflops = steps_per_s * n_frames * ff.flops_per_env_substep(m) / 1e9
  # BASELINE.json config 3 names rodent_optimized.xml; rodent_new.xml is
  # dimensionally identical (nq=74, nv=73, same obs) differing only in
  # head-geom (skull/jaw) collidability — either satisfies the headline
  # shape, and we report which one actually ran.
  default_shape = (num_envs == 2048 and
                   model_xml in ("rodent_optimized.xml", "rodent_new.xml"))
  metric = ("rodent_env_steps_per_s_2048envs_1chip" if default_shape else
            f"{os.path.splitext(model_xml)[0]}_env_steps_per_s_"
            f"{num_envs}envs_1chip")
  out = {
      "metric": metric,
      "value": round(steps_per_s, 1),
      "unit": "env_steps/s",
      "model_xml": model_xml,
      "executed_gflops_per_s": round(gflops, 1),
      "pct_peak_bf16_v5e": round(100.0 * gflops / 197000.0, 2),
      **gate_info,
  }
  rung = os.environ.get("BRR_BENCH_RUNG")
  if rung is not None:
    # attribute the number to the ladder rung that produced it (a fused-
    # kernel regression must be visible as a fallback, not a quiet drop)
    out["rung"] = int(rung)
    out["rung_flags"] = json.loads(os.environ.get("BRR_BENCH_RUNG_FLAGS",
                                                  "{}"))
  # the baseline ratio is only meaningful at the headline shape
  out["vs_baseline"] = round(steps_per_s / BASELINE_ENV_STEPS_PER_S,
                             3) if default_shape else None
  print(json.dumps(out))


def _emit_failure(reason: str, rungs_failed=None) -> None:
  """The driver parses the last JSON line; on any total failure it must
  still get one (VERDICT r2 weak #1 — the r2 ladder hung a whole driver
  window and produced nothing). If this session measured a real number
  earlier (perf_logs/*.log), report it with EXPLICIT staleness
  provenance instead of null — the tunnel flaps for hours at a time
  and a dead probe at the moment the driver runs should not erase the
  round's measurements."""
  stale = _latest_measured()
  if stale is not None:
    out, src, mtime = stale
    out = dict(out)
    out["stale"] = True
    out["stale_source"] = src
    if mtime is not None:
      out["stale_measured_at_unix"] = mtime
    out["error"] = (f"{reason}; value is the most recent recorded "
                    "on-chip measurement (see stale_source)")
    if rungs_failed:
      out["rungs_failed"] = rungs_failed
    print(json.dumps(out), flush=True)
    return
  print(json.dumps({
      "metric": "rodent_env_steps_per_s_2048envs_1chip",
      "value": None,
      "unit": "env_steps/s",
      "vs_baseline": None,
      "error": reason,
      **({"rungs_failed": rungs_failed} if rungs_failed else {}),
  }), flush=True)


def _latest_measured(pick: str = "latest"):
  """Most recent (pick="latest") or highest-value (pick="best")
  parseable headline-bench JSON with a non-null value from
  perf_logs/*.log: (record, source_path, file_mtime) or None."""
  import glob
  import re
  best = None
  want_model = os.environ.get("BRR_BENCH_MODEL")
  root = os.path.dirname(os.path.abspath(__file__))
  # perf_logs/ is per-machine scratch (gitignored); the committed
  # perf_logs_sweep_*.log battery transcripts keep the fallback alive
  # across machine resets (r4: a fresh host + dead tunnel would
  # otherwise erase the whole round's measurements again). Checkout
  # mtimes are meaningless for committed files, so rank them by round
  # number, always below any log this machine actually produced.
  def _rank(path):
    mt = re.search(r"perf_logs_sweep_r(\d+)\.log$", path)
    if mt:
      return (0, int(mt.group(1)))
    try:
      return (1, os.path.getmtime(path))
    except OSError:
      return (1, 0.0)

  for path in sorted(
      glob.glob(os.path.join(root, "perf_logs", "*.log"))
      + glob.glob(os.path.join(root, "perf_logs_sweep_*.log")), key=_rank):
    committed = re.search(r"perf_logs_sweep_r\d+\.log$", path)
    try:
      # checkout mtimes of committed sweep logs are meaningless
      # (advisor r4): report None and let the caller carry the round
      # number in stale_source instead
      mtime = None if committed else os.path.getmtime(path)
      with open(path, "rb") as f:
        data = f.read().decode("utf-8", "replace")
    except OSError:
      continue
    # multi-record transcripts (sweep batteries) interleave nulls,
    # stale fallbacks, and other-model runs with real measurements —
    # scan PAST those instead of abandoning the file (advisor r4: a
    # trailing dead-tunnel null record erased a whole round's numbers)
    for line in reversed(data.splitlines()):
      if not line.startswith('{"metric"'):
        continue
      try:
        rec = json.loads(line)
      except ValueError:
        continue
      if rec.get("value") is None or rec.get("stale"):
        continue
      if rec.get("gate_ok") is False:
        continue  # never resurrect a number whose numerics gate failed
      if want_model and rec.get("model_xml") != want_model:
        continue
      if not want_model and rec.get("model_xml") not in (
          "rodent_optimized.xml", "rodent_new.xml"):
        continue
      if pick == "best":
        if best is None or rec["value"] > best[0]["value"]:
          best = (rec, os.path.basename(path), mtime)
        continue  # best-mode scans every record of every file
      best = (rec, os.path.basename(path), mtime)
      break
  return best


def _probe_device(timeout_s: float = 90.0, attempts: int = 8) -> bool:
  """Tiny-matmul probe in a CHILD process: when the axon tunnel is dead,
  jax ops HANG rather than raise, so the probe must be killable.

  Retried generously: the tunnel FLAPS on a minutes timescale (r4:
  probes failed between two successful rungs all day), so the probe
  waits out a flap (~12 min worst case) rather than blanking the
  bench; the caller's rung timeout still bounds total damage."""
  import subprocess
  import sys
  code = ("import jax, jax.numpy as jnp; "
          "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))")
  for i in range(attempts):
    try:
      r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                         capture_output=True)
      if r.returncode == 0:
        return True
    except subprocess.TimeoutExpired:
      pass
    if i + 1 < attempts:
      print(f"[bench] probe attempt {i} failed; retrying", flush=True)
  return False


def _main_with_fallback():
  """Run the bench in a CHILD process per attempt (the parent never
  initializes the TPU client, so a failed rung releases the chip for
  the next one); if the fast path fails on-device (e.g. a Mosaic
  regression in a new kernel feature), retry with progressively more
  conservative flags so the driver ALWAYS gets a JSON line. Env flags
  are read at kernel-build time behind lru caches, so each attempt
  must be a fresh process anyway."""
  import subprocess
  import sys
  kwargs = {}
  if os.environ.get("BRR_BENCH_MODEL"):
    kwargs["model_xml"] = os.environ["BRR_BENCH_MODEL"]
  if os.environ.get("BRR_BENCH_ENVS"):
    kwargs["num_envs"] = int(os.environ["BRR_BENCH_ENVS"])
  if os.environ.get("BRR_BENCH_NO_RETRY"):
    main(**kwargs)                 # in-child: actually run the bench
    return
  if not _probe_device():
    _emit_failure("tpu_unreachable: 8x8 matmul probe failed/hung (8x90s)")
    return
  ladders = [
      {},                                  # fast path (dense + parallel LS)
      {"BRR_CG_UNROLL": "1"},              # unrolled CG (no inner scf.for)
      {"BRR_CG_UNROLL": "1", "BRR_LS_SEQ": "1"},   # + sequential LS
      {"BRR_CG_UNROLL": "1", "BRR_LS_SEQ": "1",
       "BRR_CHOL_SPLIT": "1"},             # + unpaired factor passes
      {"BRR_NO_FUSED": "1"},               # pure XLA stage path
  ]
  # first rung may pay a fresh multi-minute Mosaic compile (the sparse
  # kernel's unrolled factor+inverse is ~1k ops; r4 saw a cold compile
  # overrun 2400 s); later rungs are retries and get a shorter leash so
  # a dead tunnel can't eat the window
  rung_timeouts = [3300.0, 1800.0, 1200.0, 1200.0, 1200.0]
  # per-rung forensics (VERDICT r4 #2): when the surviving rung is a
  # fallback, the final JSON must say what killed the better rungs —
  # r4's rung-4 headline was unexplainable from the artifact alone.
  rungs_failed = []
  for i, flags in enumerate(ladders):
    env = dict(os.environ, BRR_BENCH_NO_RETRY="1", BRR_BENCH_RUNG=str(i),
               BRR_BENCH_RUNG_FLAGS=json.dumps(flags), **flags)
    try:
      r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                         env=env, timeout=rung_timeouts[i],
                         capture_output=True)
    except subprocess.TimeoutExpired:
      print(f"[bench] attempt {i} timed out", flush=True)
      rungs_failed.append({"rung": i, "reason": "timeout",
                           "timeout_s": rung_timeouts[i]})
      if not _probe_device():
        _emit_failure(f"tpu_died_mid_bench: rung {i} timed out and the "
                      "re-probe failed", rungs_failed)
        return
      continue
    sout = r.stdout.decode("utf-8", "replace")
    serr = r.stderr.decode("utf-8", "replace")
    if r.returncode == 0:
      _emit_success(sout, serr, rungs_failed)
      return
    # attribute the failure: gate refusal prints a gate_failed JSON
    # line; crashes leave a traceback tail in stderr
    reason = {"rung": i, "rc": r.returncode}
    for line in reversed(sout.splitlines()):
      if line.startswith('{"gate_failed"'):
        reason["reason"] = "numerics_gate_failed"
        try:
          reason["gate"] = json.loads(line)
        except ValueError:
          pass
        break
    if "reason" not in reason:
      tb = [l for l in serr.splitlines() if l.strip()][-3:]
      reason["reason"] = "crash"
      reason["stderr_tail"] = tb
    rungs_failed.append(reason)
    print(f"[bench] attempt {i} failed "
          f"({reason['reason']}, rc={r.returncode}); "
          "retrying with conservative flags", flush=True)
    for l in (serr.splitlines())[-15:]:
      print(f"[bench] rung{i} stderr: {l}", flush=True)
  _emit_failure("all_rungs_failed", rungs_failed)


def _emit_success(child_stdout: str, child_stderr: str, rungs_failed):
  """Re-emit the winning child's JSON line, augmented with per-rung
  forensics and — when the surviving (fallback) value is below the best
  measurement recorded this session — that best, with provenance, so a
  fallback headline is self-explaining (VERDICT r4 #2)."""
  final = None
  for line in reversed(child_stdout.splitlines()):
    if line.startswith('{"metric"'):
      try:
        final = json.loads(line)
      except ValueError:
        pass
      break
  if final is None:  # child exited 0 without a JSON line: pass through
    print(child_stdout, flush=True)
    return
  for line in child_stdout.splitlines():
    if not line.startswith('{"metric"'):
      print(line, flush=True)
  if rungs_failed:
    final["rungs_failed"] = rungs_failed
  best = _latest_measured(pick="best")
  if (best is not None and final.get("value") is not None
      and best[0].get("value", 0) > final["value"] * 1.05):
    rec, src, _ = best
    final["best_this_session"] = {
        "value": rec["value"], "source": src,
        "rung": rec.get("rung"), "rung_flags": rec.get("rung_flags"),
        "gate_ok": rec.get("gate_ok"),
    }
  print(json.dumps(final), flush=True)


if __name__ == "__main__":
  _main_with_fallback()
