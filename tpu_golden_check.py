"""On-chip numerics gate (VERDICT r2 #7), two checks in one JSON line:

1. kernel_vs_stage_err — the REAL Mosaic-kernel gate: one control step
   (10 substeps) from the same state, batched (dispatches the fused
   Pallas kernel via the custom-vmap rule) vs unbatched (XLA stage
   composition), BOTH on the default backend. No cross-backend or
   chaos-amplification noise; budget is the one-control-step f32
   reassociation envelope. Round 4 discovery: the previous version of
   this script rolled out UNBATCHED only, which never dispatches the
   kernel — it was testing XLA-vs-XLA across backends.

2. golden_max_abs_err — the 20-control-step truncated-f32 trajectory
   vs the CPU-generated golden tests/data/rodent_new_trunc_f32.npz
   (unbatched XLA path). Chaos-amplified across 200 contact-rich
   substeps AND across backends, so this is a drift TREND metric; the
   per-step error profile is emitted for diagnosis. `ok` gates on the
   kernel check plus the FIRST-step golden error (pre-amplification).

Prints one JSON line; exit 0 iff ok.
"""

import json
import os

import numpy as np

_ROOT = os.path.dirname(os.path.abspath(__file__))
_GOLDEN = os.path.join(_ROOT, "tests", "data", "rodent_new_trunc_f32.npz")


def _load_model():
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  mj = mujoco.MjModel.from_xml_path(os.path.join(_ROOT, "assets",
                                                 "rodent_new.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = 8
  mj.opt.ls_iterations = 8
  mj.opt.tolerance = 0.0
  mj.opt.ls_tolerance = 0.0
  mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  return mj, from_mj_model(mj)


def _golden_rollout(mj, m, n_steps: int = 20, precision: str = "highest"):
  """n_steps control steps (10 substeps each), f32, truncated CG 8/8,
  fixed-seed smoothed random ctrl — mirrors tests/test_truncated.py.

  precision: the golden .npz was generated on CPU, where f32 matmuls
  are exact f32. On TPU the DEFAULT lowers f32 matmuls to bf16 MXU
  passes, which alone drifts step 1 by ~2e-3 (the r4 "budget breach").
  The apples-to-apples comparison therefore pins "highest" (true-f32
  6-pass); the default-precision drift is reported separately as a
  trend metric, not gated at the f32 budget."""
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  rng = np.random.RandomState(7)
  d = make_data(m, dtype=jnp.float32)
  d = d.replace(qpos=jnp.asarray(mj.qpos0, jnp.float32))
  with jax.default_matmul_precision(precision):
    step = jax.jit(lambda d, u: forward.step(m, d, u))
    u = np.zeros(mj.nu)
    qpos = []
    for _ in range(n_steps):
      u = np.clip(0.8 * u + 0.2 * rng.uniform(-1, 1, mj.nu), -1, 1)
      for _ in range(10):
        d = step(d, jnp.asarray(u, jnp.float32))
      qpos.append(np.asarray(d.qpos, np.float64))
  return np.stack(qpos)


def _kernel_gate(m, batch: int = 128):
  """Two-part on-chip kernel gate (ops/gate.full_gate): sequential-LS
  machinery check vs the highest-precision stage, plus the production
  parallel-LS lever bounded at its own envelope. K=8 DISTINCT states
  interleaved across lanes (identical-lane gates cannot see per-env
  mask bugs like r4's done[0] regression)."""
  from brax_rodent_run_tpu.ops import gate
  return gate.full_gate(m, batch=batch)


def main() -> int:
  import jax
  # the axon sitecustomize force-registers the tunnel backend even with
  # JAX_PLATFORMS=cpu exported; honor an explicit cpu request before the
  # first device query (a hung tunnel stalls CPU validation runs at init)
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
  from brax_rodent_run_tpu.utils.cache import configure_cache
  configure_cache(_ROOT)

  mj, m = _load_model()

  from brax_rodent_run_tpu.ops import gate
  kbudget = gate.KERNEL_BUDGET  # one control step, f32 envelope
  g = _kernel_gate(m)
  kerr = None if g is None else g["seq_err"]

  golden = np.load(_GOLDEN)["qpos"]
  got = _golden_rollout(mj, m)  # highest precision: true-f32 comparison
  per_step = np.max(np.abs(got - golden), axis=1)
  budget = 5e-2  # matches test_truncated_f32_trajectory_golden
  first_budget = 1e-3  # step-1 drift before chaos amplification

  # default-precision step-1 drift: info-only trend metric (bf16 MXU
  # passes are the production numeric regime; its envelope is ~2e-3)
  step1_default = float(np.max(np.abs(
      _golden_rollout(mj, m, n_steps=1, precision="default") - golden[:1])))

  ok = bool(per_step[0] < first_budget)
  if g is not None:
    ok = ok and g["ok"]
  out = {
      "kernel_vs_stage_err": kerr,
      "kernel_lever_err": None if g is None else g["lever_err"],
      "kernel_lever_budget": gate.LEVER_BUDGET,
      "gate_states_skipped_borderline_contact": (
          None if g is None else g["n_skipped"]),
      "kernel_budget": kbudget,
      "golden_max_abs_err": float(per_step.max()),
      "golden_step1_err": float(per_step[0]),
      "golden_step1_budget": first_budget,
      "golden_step1_err_default_precision": step1_default,
      "golden_per_step": [round(float(x), 6) for x in per_step],
      "trajectory_budget_info": budget,
      "ok": ok,
      "backend": jax.default_backend(),
  }
  print(json.dumps(out))
  return 0 if out["ok"] else 1


if __name__ == "__main__":
  raise SystemExit(main())
