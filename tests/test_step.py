"""Full-step trajectory parity vs MuJoCo C (BASELINE config 1 contract).

mj_step vs our forward+Euler over multi-step rollouts with random ctrl,
warmstart disabled on the oracle (our solver starts from qacc_smooth, which
is MJX semantics — the configuration the reference actually trains with).
Uses converged solver settings so both sides reach the same fixed point;
truncated-iteration (CG 8/8) behavior is exercised by the env tests instead.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import forward
from brax_rodent_run_tpu.physics.types import make_data

CASES = [
    # (model, solver, steps, tol)  — short horizons: the test host is a
    # single CPU core; long-horizon behavior is covered by the env tests
    ("humanoid.xml", "newton", 25, 1e-5),
    ("humanoid.xml", "cg", 25, 1e-5),
    ("rodent_new.xml", "cg", 10, 1e-5),
    # BASELINE config 1: the full dm_control-style rat — fixed base,
    # 8 fixed tendons + tendon actuators (rodent_cpu.xml:505-560), 26
    # active contact excludes (:477-504)
    ("rodent_cpu.xml", "cg", 10, 1e-5),
]


@pytest.mark.parametrize("name,solver,steps,tol", CASES)
def test_trajectory(name, solver, steps, tol):
  mj_model = mujoco.MjModel.from_xml_path(model_path(name))
  mj_model.opt.jacobian = 0
  mj_model.opt.solver = {"cg": mujoco.mjtSolver.mjSOL_CG,
                         "newton": mujoco.mjtSolver.mjSOL_NEWTON}[solver]
  mj_model.opt.iterations = 150
  mj_model.opt.ls_iterations = 60
  mj_model.opt.tolerance = 1e-12
  mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  m = from_mj_model(mj_model)

  rng = np.random.RandomState(0)
  mjd = mujoco.MjData(mj_model)
  q = mj_model.qpos0.copy()
  for j in range(mj_model.njnt):
    if mj_model.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      adr = mj_model.jnt_qposadr[j]
      q[adr + 2] += 0.02
  mjd.qpos[:] = q
  ctrls = rng.uniform(-1, 1, (steps, mj_model.nu))

  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos))
  step = jax.jit(lambda d, u: forward.step(m, d, u))

  max_err = 0.0
  for t in range(steps):
    mjd.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj_model, mjd)
    d = step(d, ctrls[t])
    err = float(np.max(np.abs(np.asarray(d.qpos) - mjd.qpos)))
    max_err = max(max_err, err)
    assert err < tol * (1 + 30 * t), (
        f"{name}/{solver} diverged at step {t}: {err}")
    if mj_model.nsensordata:
      # sensor parity rides the same rollout (rodent declares 8 sensors,
      # rodent_new.xml:558-567); avoids a second multi-minute jit compile
      serr = float(np.max(
          np.abs(np.asarray(d.sensordata) - mjd.sensordata)
          / (1.0 + np.abs(mjd.sensordata))))
      assert serr < 100 * tol * (1 + 30 * t), (
          f"{name}/{solver} sensordata diverged at step {t}: {serr}")
  # report-style sanity: final state finite
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  assert np.all(np.isfinite(np.asarray(d.qvel)))
