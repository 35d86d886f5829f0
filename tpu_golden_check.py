"""On-chip numerics gate (VERDICT r2 #7): run the golden truncated-f32
rodent trajectory on the DEFAULT backend (TPU under the driver env) and
diff against the CPU-generated golden `tests/data/rodent_new_trunc_f32.npz`.

Mosaic codegen / TPU fma-and-reduction order differences get a loose-f32
chaos-amplified budget (the same budget the CPU cross-XLA-version pin in
tests/test_truncated.py::test_truncated_f32_trajectory_golden uses);
anything beyond it means TPU execution has semantically drifted from the
trajectory the oracle-parity suite certifies, i.e. training physics on
chip would silently differ from what the tests validate.

The rollout is a standalone re-statement of tests/test_truncated.py's
_golden_rollout (that module imports tests.conftest, which pins the CPU
backend at import time — exactly what this script must not do).

Prints one JSON line {"golden_max_abs_err", "budget", "ok", "backend"}.
"""

import json
import os

import numpy as np

_ROOT = os.path.dirname(os.path.abspath(__file__))
_GOLDEN = os.path.join(_ROOT, "tests", "data", "rodent_new_trunc_f32.npz")


def _golden_rollout():
  """20 control steps (200 substeps), f32, truncated CG 8/8, fixed-seed
  smoothed random ctrl — mirrors tests/test_truncated.py exactly."""
  import mujoco
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.physics import forward

  from brax_rodent_run_tpu.physics.types import make_data

  mj = mujoco.MjModel.from_xml_path(os.path.join(_ROOT, "assets",
                                                 "rodent_new.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = 8
  mj.opt.ls_iterations = 8
  mj.opt.tolerance = 0.0
  mj.opt.ls_tolerance = 0.0
  mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  m = from_mj_model(mj)
  rng = np.random.RandomState(7)
  d = make_data(m, dtype=jnp.float32)
  d = d.replace(qpos=jnp.asarray(mj.qpos0, jnp.float32))
  step = jax.jit(lambda d, u: forward.step(m, d, u))
  u = np.zeros(mj.nu)
  qpos = []
  for _ in range(20):
    u = np.clip(0.8 * u + 0.2 * rng.uniform(-1, 1, mj.nu), -1, 1)
    for _ in range(10):
      d = step(d, jnp.asarray(u, jnp.float32))
    qpos.append(np.asarray(d.qpos, np.float64))
  return np.stack(qpos)


def main() -> int:
  import jax
  # the axon sitecustomize force-registers the tunnel backend even with
  # JAX_PLATFORMS=cpu exported; honor an explicit cpu request before the
  # first device query (a hung tunnel stalls CPU validation runs at init)
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
  cache = os.path.join(_ROOT, ".jax_cache")
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
  jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

  golden = np.load(_GOLDEN)["qpos"]
  got = _golden_rollout()
  err = float(np.max(np.abs(got - golden)))
  budget = 5e-2  # matches test_truncated_f32_trajectory_golden
  out = {
      "golden_max_abs_err": err,
      "budget": budget,
      "ok": bool(err < budget),
      "backend": jax.default_backend(),
  }
  print(json.dumps(out))
  return 0 if out["ok"] else 1


if __name__ == "__main__":
  raise SystemExit(main())
