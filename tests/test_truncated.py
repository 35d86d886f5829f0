"""Parity in the regime PPO actually trains in: CG truncated to 8/8
iterations, f32, dt=0.002 (brax_rodent_run_ppo.py:52-53) — VERDICT.md r1 #3.

The MuJoCo C oracle (warmstart disabled => solver starts from qacc_smooth,
the MJX/our semantics) is run at the SAME truncated iteration counts.
Findings this suite locks in:

- our CG iterates match MuJoCo's BIT-FOR-BIT for iterations <= 4 and at
  convergence (same cost, same preconditioned PR+ direction, same exact
  line-search root).  The pyramidal-row diagApprox 2*mu^2*(1+mu^2)*iw
  (not 2*(1+mu^2)*iw) is load-bearing for this — a mu^2-off efc_D shifts
  every truncated iterate.
- from iteration ~5 on deeply-unconverged multi-contact states, MuJoCo's
  eval-capped bracketing line search stops at a NON-exact 1-D minimum
  (observable as solver[k].neval hitting the cap) while ours lands on the
  exact root; the iterate paths then drift apart.  MJX — the engine the
  reference actually trains on — has a third distinct line search, so
  bit-parity beyond this point is not well-defined between reference
  implementations either.  We therefore assert exactness where it is
  (<=4 iters, convergence) and a bounded envelope at 8/8.
- a golden-file regression pins the full f32 truncated trajectory so ANY
  future drift of truncated-solver/f32 behavior fails loudly
  (regenerate: python tests/test_truncated.py --regen).
"""

import os

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import forward
from brax_rodent_run_tpu.physics.types import make_data

_GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                       "rodent_new_trunc_f32.npz")


def _truncated_model(iterations=8, ls_iterations=8):
  mj = mujoco.MjModel.from_xml_path(model_path("rodent_new.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = iterations
  mj.opt.ls_iterations = ls_iterations
  mj.opt.tolerance = 0.0          # force the full iteration count
  mj.opt.ls_tolerance = 0.0
  mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  return mj


def _drop_state(mj, n_substeps=50):
  """A contact-rich state: drop from qpos0 under random ctrl."""
  mjd = mujoco.MjData(mj)
  mjd.qpos[:] = mj.qpos0
  rng = np.random.RandomState(0)
  mjd.ctrl[:] = rng.uniform(-1, 1, mj.nu)
  for _ in range(n_substeps):
    mujoco.mj_step(mj, mjd)
  return mjd.qpos.copy(), mjd.qvel.copy(), mjd.act.copy(), mjd.ctrl.copy()


@pytest.mark.parametrize("iterations", [1, 2, 4])
def test_truncated_iterates_match_oracle_exactly(iterations):
  """<=4 CG iterations: qacc must match mj bit-for-bit (f64).

  The drop state is generated with the CONVERGED solver: on such states
  mj's line search finds the exact 1-D root within its eval cap, so the
  truncated iterate paths are identical and any deviation here is a real
  semantic regression (on rougher states mj's LS is eval-capped off the
  root from iteration 0 and bit-parity is not defined — see module
  docstring)."""
  base = _truncated_model(iterations=150, ls_iterations=60)
  qpos, qvel, act, ctrl = _drop_state(base)
  mj = _truncated_model(iterations=iterations)
  mjd = mujoco.MjData(mj)
  mjd.qpos[:] = qpos; mjd.qvel[:] = qvel; mjd.act[:] = act
  mjd.ctrl[:] = ctrl
  mujoco.mj_forward(mj, mjd)

  m = from_mj_model(mj)
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(qpos), qvel=jnp.array(qvel),
                act=jnp.array(act), ctrl=jnp.array(ctrl))
  d = forward.forward(m, d)
  scale = 1.0 + float(np.max(np.abs(mjd.qacc)))
  err = float(np.max(np.abs(np.asarray(d.qacc) - mjd.qacc))) / scale
  assert err < 1e-9, err


def test_training_regime_substep_envelope():
  """f32, CG 8/8, per-substep state-synced stepping vs the oracle over 150
  substeps.  On contact-rich grounded states mj's eval-capped line search
  stops off the exact 1-D root nearly every substep, so per-substep
  divergence is irreducible; the test asserts the calibrated envelope
  below, which a mu^2-class efc_D error exceeds by ~40x."""
  mj = _truncated_model()
  m = from_mj_model(mj)
  mjd = mujoco.MjData(mj)
  mjd.qpos[:] = mj.qpos0
  rng = np.random.RandomState(3)
  u = np.zeros(mj.nu)
  d = make_data(m, dtype=jnp.float32)
  step = jax.jit(lambda d, u: forward.step(m, d, u))
  errs = []
  for t in range(15):
    u = np.clip(0.8 * u + 0.2 * rng.uniform(-1, 1, mj.nu), -1, 1)
    for _ in range(10):
      d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32),
                    qvel=jnp.asarray(mjd.qvel, jnp.float32),
                    act=jnp.asarray(mjd.act, jnp.float32))
      mjd.ctrl[:] = u
      mujoco.mj_step(mj, mjd)
      d = step(d, jnp.asarray(u, jnp.float32))
      errs.append(float(np.max(np.abs(
          np.asarray(d.qvel, np.float64) - mjd.qvel))))
  errs = np.asarray(errs)
  # Calibrated envelope.  Measured floors (this loop, this seed):
  #   correct efc_D + exact implicit damping:
  #                   median 0.039, p90 0.91, frac<0.2 = 0.71, max 6.1
  #   correct efc_D, 6-iter damping CG (pre-r2): median 0.054
  #   mu^2-off efc_D: median 2.34,  p90 9.79, frac<0.2 = 0.047, max 21.9
  # The gap is ~40x, so these bounds discriminate semantic drift from
  # line-search divergence noise (mj's eval-capped LS vs our exact root).
  assert np.median(errs) < 0.3, np.median(errs)
  assert np.mean(errs < 0.2) > 0.5, np.mean(errs < 0.2)
  assert errs.max() < 15.0, errs.max()


def _golden_rollout():
  """20 control steps (200 substeps), f32, truncated CG 8/8, fixed ctrl."""
  mj = _truncated_model()
  m = from_mj_model(mj)
  rng = np.random.RandomState(7)
  d = make_data(m, dtype=jnp.float32)
  d = d.replace(qpos=jnp.asarray(mj.qpos0, jnp.float32))
  step = jax.jit(lambda d, u: forward.step(m, d, u))
  u = np.zeros(mj.nu)
  qpos = []
  for t in range(20):
    u = np.clip(0.8 * u + 0.2 * rng.uniform(-1, 1, mj.nu), -1, 1)
    for _ in range(10):
      d = step(d, jnp.asarray(u, jnp.float32))
    qpos.append(np.asarray(d.qpos, np.float64))
  return np.stack(qpos)


def test_truncated_f32_trajectory_golden():
  """Regression pin: the f32 truncated-solver trajectory must reproduce
  the recorded golden within loose-f32 tolerance. Fails on ANY semantic
  drift of the truncated/f32 path (solver, constraint, integrator)."""
  assert os.path.exists(_GOLDEN), (
      "golden missing — run: python tests/test_truncated.py --regen")
  want = np.load(_GOLDEN)["qpos"]
  got = _golden_rollout()
  # f32 run-to-run on one platform is deterministic; cross-XLA-version
  # reassociation gets a small budget, chaos-amplified over 200 substeps
  err = np.max(np.abs(got - want))
  assert err < 5e-2, err


if __name__ == "__main__":
  import sys
  if "--regen" in sys.argv:
    os.makedirs(os.path.dirname(_GOLDEN), exist_ok=True)
    np.savez(_GOLDEN, qpos=_golden_rollout())
    print("golden written:", _GOLDEN)
