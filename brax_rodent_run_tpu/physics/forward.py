"""Full forward dynamics + semi-implicit Euler step (mj_forward/mj_step).

`step(m, d, ctrl)` is the single-substep entry point; environments scan it
n_frames times per control step (Rodent_Env_Brax.py:53-57 uses 10 substeps
of 0.002 s). Unbatched Data; vmap for the env batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics import collision, constraint, math, smooth
from brax_rodent_run_tpu.physics import sensor as sensor_mod
from brax_rodent_run_tpu.physics import solver as solver_mod
from brax_rodent_run_tpu.physics.types import (
    Data, DisableBit, JointType, Model)


def fwd_position(m: Model, d: Data) -> Data:
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  d = collision.collision(m, d)
  d = smooth.transmission(m, d)
  d = constraint.make_constraint(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  d = smooth.com_vel(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  return d


def forward(m: Model, d: Data) -> Data:
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = sensor_mod.sensor_vel(m, d)
  d = smooth.fwd_actuation(m, d)
  d = smooth.fwd_acceleration(m, d)
  d = solver_mod.solve(m, d)
  d = sensor_mod.sensor_acc(m, d)
  return d


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   h) -> jax.Array:
  """mj_integratePos: joint-type-aware position integration."""
  out = qpos
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jt == JointType.FREE:
      pos = qpos[qadr:qadr + 3] + h * qvel[vadr:vadr + 3]
      quat = math.quat_integrate(qpos[qadr + 3:qadr + 7],
                                 qvel[vadr + 3:vadr + 6], h)
      out = jax.lax.dynamic_update_slice(
          out, jnp.concatenate([pos, quat]), (qadr,))
    elif jt in (JointType.HINGE, JointType.SLIDE):
      out = out.at[qadr].set(qpos[qadr] + h * qvel[vadr])
    else:
      raise NotImplementedError(f"joint type {jt}")
  return out


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with optional implicit joint damping (eulerdamp)."""
  dt = d.qpos.dtype
  h = jnp.asarray(m.opt.timestep, dt)

  # activation dynamics integrate explicitly
  act = d.act + h * d.act_dot if m.na else d.act

  qacc = d.qacc
  eulerdamp = not (m.opt.disableflags & DisableBit.EULERDAMP)
  if eulerdamp and np.any(m.dof_damping > 0):
    # implicit damping: (M + h*diag(B)) qacc' = total force
    MhB = d.qM + h * jnp.diag(jnp.asarray(m.dof_damping, dt))
    L = jax.scipy.linalg.cholesky(MhB, lower=True)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    qacc = jax.scipy.linalg.cho_solve((L, True), qfrc[:, None])[:, 0]

  qvel = d.qvel + h * qacc
  qpos = _integrate_pos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step(m: Model, d: Data, ctrl: jax.Array | None = None) -> Data:
  """One physics substep: forward dynamics + Euler integration."""
  if ctrl is not None:
    d = d.replace(ctrl=jnp.asarray(ctrl, d.qpos.dtype))
  d = forward(m, d)
  return euler(m, d)


def make_put_data(m: Model, qpos=None, qvel=None, dtype=None) -> Data:
  """Fresh Data at (qpos0 | given state), forward'd once (pipeline_init)."""
  from brax_rodent_run_tpu.physics.types import make_data
  d = make_data(m, dtype=dtype)
  if qpos is not None:
    d = d.replace(qpos=jnp.asarray(qpos, d.qpos.dtype))
  if qvel is not None:
    d = d.replace(qvel=jnp.asarray(qvel, d.qpos.dtype))
  return forward(m, d)
