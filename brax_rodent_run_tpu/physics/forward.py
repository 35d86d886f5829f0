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


def forward(m: Model, d: Data, sensors: bool = True) -> Data:
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  if sensors:
    d = sensor_mod.sensor_vel(m, d)
  d = smooth.fwd_actuation(m, d)
  d = smooth.fwd_acceleration(m, d)
  d = solver_mod.solve(m, d)
  if sensors:
    d = sensor_mod.sensor_acc(m, d)
  return d


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   h) -> jax.Array:
  """mj_integratePos: joint-type-aware position integration.

  Scalar joints integrate in ONE masked gather (static qpos->qvel index
  map) instead of a per-joint .at[] chain; only free/ball joints (quat
  exponential) are handled per joint (the models have exactly one)."""
  bad = set(int(t) for t in m.jnt_type) - {
      int(JointType.FREE), int(JointType.HINGE), int(JointType.SLIDE)}
  if bad:
    raise NotImplementedError(f"joint types {bad}")

  # static maps, built once per trace
  vmap_idx = np.zeros(m.nq, np.int32)
  scalar_mask = np.zeros(m.nq, bool)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jt in (JointType.HINGE, JointType.SLIDE):
      vmap_idx[qadr] = vadr
      scalar_mask[qadr] = True
    else:  # FREE: translational part integrates linearly too
      vmap_idx[qadr:qadr + 3] = np.arange(vadr, vadr + 3)
      scalar_mask[qadr:qadr + 3] = True

  out = jnp.where(jnp.asarray(scalar_mask),
                  qpos + h * qvel[jnp.asarray(vmap_idx)], qpos)
  for j in range(m.njnt):
    if int(m.jnt_type[j]) == JointType.FREE:
      qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      quat = math.quat_integrate(qpos[qadr + 3:qadr + 7],
                                 qvel[vadr + 3:vadr + 6], h)
      out = jax.lax.dynamic_update_slice(out, quat, (qadr + 3,))
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
    # implicit damping: (M + h*diag(B)) qacc' = total force — EXACT
    # solve, matching MuJoCo's mj_solveLD semantics. (A 6-iteration
    # M^-1-preconditioned CG used here through round 2 left ~8e-3
    # relative error on contact-rich states — measured vs the exact
    # solve — shifting the truncated-solver trajectory envelope.)
    from brax_rodent_run_tpu.ops.cholesky import spd_inverse
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    MhB = d.qM + h * jnp.diag(jnp.asarray(m.dof_damping, dt))
    qacc = spd_inverse(MhB) @ qfrc

  qvel = d.qvel + h * qacc
  qpos = _integrate_pos(m, d.qpos, qvel, h)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step_fused(m: Model, d: Data, sensors: bool = True) -> Data:
  """forward + euler with the fused implicit-dynamics op (ops/fused.py):
  crb+factor, make_constraint, fwd_acceleration, solve and euler's
  damping CG collapse into one kernel on TPU (exact stage composition
  everywhere else). qM/qMinv/con_Jbase/efc_D... are left untouched —
  nothing downstream of this path reads them."""
  from brax_rodent_run_tpu.ops import fused as fused_mod

  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)
  d = collision.collision(m, d)
  d = smooth.transmission(m, d)
  d = smooth.com_vel(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  if sensors:
    d = sensor_mod.sensor_vel(m, d)
  d = smooth.fwd_actuation(m, d)
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied)
  (qacc, qacc_smooth, qfrc_constraint, efc_force,
   qvel_new) = fused_mod.fused_entry(m)(
      d.qpos, d.qvel, d.cinert, d.cdof, qfrc_smooth,
      d.contact.dist, d.contact.pos, d.contact.frame, d.subtree_com)
  d = d.replace(qacc=qacc, qacc_smooth=qacc_smooth,
                qfrc_smooth=qfrc_smooth,
                qfrc_constraint=qfrc_constraint, efc_force=efc_force)
  if sensors:
    d = sensor_mod.sensor_acc(m, d)
  h = jnp.asarray(m.opt.timestep, d.qpos.dtype)
  act = d.act + h * d.act_dot if m.na else d.act
  qpos = _integrate_pos(m, d.qpos, qvel_new, h)
  return d.replace(qpos=qpos, qvel=qvel_new, act=act, time=d.time + h)


def step_fused_full(m: Model, d: Data, sensors: bool = True) -> Data:
  """kinematics + collision in XLA; EVERYTHING else — com_pos through
  Euler integration — in the full-dynamics Pallas kernel
  (ops/fused_full.py). Sensor stages run on the pre-integration state,
  exactly where the stage pipeline runs them."""
  from brax_rodent_run_tpu.ops import fused_full as ff

  d = smooth.kinematics(m, d)
  d = collision.collision(m, d)
  (subtree_com, cinert, cdof, cvel, cdof_dot, qfrc_bias, qfrc_spring,
   qfrc_damper, qfrc_passive, alen, avel, afrc, act_dot, qfrc_actuator,
   qfrc_smooth, qacc_smooth, qacc, qfrc_constraint, efc_force,
   qpos_new, qvel_new, act_new) = ff.fused_full_entry(m)(
      d.qpos, d.qvel, d.act, d.ctrl, d.qfrc_applied,
      d.xpos, d.xmat, d.xipos, d.ximat, d.xanchor, d.xaxis,
      d.contact.dist, d.contact.pos, d.contact.frame)
  # actuator_moment is a compile-time constant in the v2 envelope
  # (scalar-joint transmission only)
  moment = jnp.asarray(ff.statics2(m).MOM[:m.nu, :m.nv], d.qpos.dtype)
  d = d.replace(
      subtree_com=subtree_com, cinert=cinert, cdof=cdof, cvel=cvel,
      cdof_dot=cdof_dot, qfrc_bias=qfrc_bias, qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper, qfrc_passive=qfrc_passive,
      actuator_length=alen, actuator_velocity=avel, actuator_force=afrc,
      actuator_moment=moment, act_dot=act_dot,
      qfrc_actuator=qfrc_actuator, qfrc_smooth=qfrc_smooth,
      qacc_smooth=qacc_smooth, qacc=qacc,
      qfrc_constraint=qfrc_constraint, efc_force=efc_force)
  if sensors:
    d = sensor_mod.sensor_vel(m, d)
    d = sensor_mod.sensor_acc(m, d)
  h = jnp.asarray(m.opt.timestep, d.qpos.dtype)
  return d.replace(qpos=qpos_new, qvel=qvel_new, act=act_new,
                   time=d.time + h)


def step(m: Model, d: Data, ctrl: jax.Array | None = None,
         sensors: bool = True) -> Data:
  """One physics substep: forward dynamics + Euler integration.

  ``sensors=False`` skips the sensor stages (sensordata passes through
  unchanged); environments use it for all but the last substep of a
  control step, where sensordata is observationally dead.
  """
  if ctrl is not None:
    d = d.replace(ctrl=jnp.asarray(ctrl, d.qpos.dtype))
  from brax_rodent_run_tpu.ops import fused as fused_mod
  from brax_rodent_run_tpu.ops import fused_full as ff
  if ff.eligible_full(m):
    return step_fused_full(m, d, sensors=sensors)
  if fused_mod.eligible(m):
    return step_fused(m, d, sensors=sensors)
  d = forward(m, d, sensors=sensors)
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


def pipeline_steps_fused(m: Model, d: Data, n_frames: int,
                         sensors: bool = True,
                         lean: bool = False) -> Data:
  """A FULL control step (n_frames substeps) in ONE Pallas kernel call
  (ops/fused_full.py v3): FK, collision narrow-phase, dynamics and
  integration loop inside the kernel; XLA only reconstructs the last
  substep's frame fields from its pre-integration qpos (one kinematics
  call per CONTROL step) and runs the sensor stages.

  ``lean=True`` (production training path): skip the XLA kinematics
  reconstruction and sensors entirely — only body 1's orientation (the
  free-joint quaternion, all the in-repo envs read) is refreshed; every
  other frame field (xpos/xquat rows != 1, geom/site frames, sensordata)
  keeps its previous value per the stale-field contract documented on
  envs/base.pipeline_step. Training math (obs/reward/done) is identical
  because the envs read only kernel outputs + xmat[1]."""
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics.types import Contact

  # lean refreshes ONLY the first free body's frame; on a model with no
  # free joint that would leave every frame field permanently stale
  # while qpos advances — fall back to the full reconstruction there
  if lean and not ff.statics2(m).free_js:
    lean = False
  if lean:
    # consumed-only kernel outputs (the kernel skips the other ~19 HBM
    # writes entirely); every other Data field keeps its prior value
    # per the stale-field contract
    (subtree_com, cinert, cvel, qfrc_actuator, qpos_new, qvel_new,
     act_new, qpos_pre) = ff.fused_steps_entry(
        m, n_frames, lean=True)(d.qpos, d.qvel, d.act, d.ctrl,
                                d.qfrc_applied)
    st2 = ff.statics2(m)
    # body 1 == first free-joint body on the in-repo envs: its frame
    # comes straight from the free quaternion (smooth.kinematics
    # free-joint branch), so no full FK is needed
    fq = st2.fqadrs[0]
    fb = st2.fbodies[0]
    quat = qpos_pre[fq + 3:fq + 7]
    quat = quat / jnp.linalg.norm(quat)
    d = d.replace(
        xpos=d.xpos.at[fb].set(qpos_pre[fq:fq + 3]),
        xquat=d.xquat.at[fb].set(quat),
        xmat=d.xmat.at[fb].set(math.quat_to_mat(quat)))
    h = jnp.asarray(m.opt.timestep, d.qpos.dtype)
    return d.replace(
        subtree_com=subtree_com, cinert=cinert, cvel=cvel,
        qfrc_actuator=qfrc_actuator,
        qpos=qpos_new, qvel=qvel_new, act=act_new,
        time=d.time + n_frames * h)

  (subtree_com, cinert, cdof, cvel, cdof_dot, qfrc_bias, qfrc_spring,
   qfrc_damper, qfrc_passive, alen, avel, afrc, act_dot, qfrc_actuator,
   qfrc_smooth, qacc_smooth, qacc, qfrc_constraint, efc_force,
   qpos_new, qvel_new, act_new,
   qpos_pre, con_dist, con_pos, con_frame) = ff.fused_steps_entry(
      m, n_frames)(d.qpos, d.qvel, d.act, d.ctrl, d.qfrc_applied)

  # frame fields of the last substep (pre-integration state)
  d = smooth.kinematics(m, d.replace(qpos=qpos_pre))
  moment = jnp.asarray(ff.statics2(m).MOM[:m.nu, :m.nv], d.qpos.dtype)
  d = d.replace(
      subtree_com=subtree_com, cinert=cinert, cdof=cdof, cvel=cvel,
      cdof_dot=cdof_dot, qfrc_bias=qfrc_bias, qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper, qfrc_passive=qfrc_passive,
      actuator_length=alen, actuator_velocity=avel, actuator_force=afrc,
      actuator_moment=moment, act_dot=act_dot,
      qfrc_actuator=qfrc_actuator, qfrc_smooth=qfrc_smooth,
      qacc_smooth=qacc_smooth, qacc=qacc,
      qfrc_constraint=qfrc_constraint, efc_force=efc_force,
      contact=Contact(dist=con_dist, pos=con_pos, frame=con_frame))
  if sensors:
    d = sensor_mod.sensor_vel(m, d)
    d = sensor_mod.sensor_acc(m, d)
  h = jnp.asarray(m.opt.timestep, d.qpos.dtype)
  return d.replace(qpos=qpos_new, qvel=qvel_new, act=act_new,
                   time=d.time + n_frames * h)
