"""Smooth (unconstrained) dynamics: kinematics through bias forces.

Pipeline stages mirror the behavioral contract of the MJX pipeline the
reference exercises via brax pipeline_init/pipeline_step
(Rodent_Env_Brax.py:87,101 — see SURVEY.md §2.3), but the implementation is
TPU-idiomatic: every tree recursion except FK is a dense matmul against a
static ancestry/subtree mask (see physics/tree.py), so the whole stage fuses
into a handful of XLA ops over the env batch under vmap.

All functions take *unbatched* Data; batching is vmap's job. Dtype follows
``d.qpos.dtype`` (tests run float64 on CPU to diff against the MuJoCo C
oracle at tight tolerance; production runs float32 on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics import math
from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import (
    Data, DisableBit, DynType, BiasType, GainType, JointType, Model, TrnType)


def _cast(x, dtype):
  return jnp.asarray(x, dtype)


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------

def kinematics(m: Model, d: Data) -> Data:
  """Body/geom/site frames from qpos (mj_kinematics contract).

  Level-vectorized: bodies are processed by tree depth, one batched
  update per level (static gathers of per-level constants, jnp.where
  branch selection per joint type). Per-body formulas are identical to
  the sequential recursion; only the grouping differs. This keeps the
  graph size O(depth * max_joints_per_body) instead of O(nbody) — the
  unrolled form was ~12k HLO ops for the rodent and dominated XLA:CPU
  compile time (254 s of the 588 s forward build)."""
  dt = d.qpos.dtype
  nb = m.nbody
  qpos = d.qpos
  mk = masks(m)

  body_pos = _cast(m.body_pos, dt)
  body_quat = _cast(m.body_quat, dt)
  jnt_pos = _cast(m.jnt_pos, dt)
  jnt_axis = _cast(m.jnt_axis, dt)
  qpos0 = _cast(m.qpos0, dt)

  bad = set(int(t) for t in m.jnt_type) - {
      int(JointType.FREE), int(JointType.HINGE), int(JointType.SLIDE)}
  if bad:
    raise NotImplementedError(f"joint types {bad}")

  xpos = jnp.zeros((nb, 3), dt)
  xquat = jnp.zeros((nb, 4), dt).at[:, 0].set(1.0)
  xanchor = jnp.zeros((max(m.njnt, 1), 3), dt)
  xaxis = jnp.zeros((max(m.njnt, 1), 3), dt)

  jnum_np = np.asarray(m.body_jntnum)
  jadr_np = np.asarray(m.body_jntadr)
  jtype_np = np.asarray(m.jnt_type)
  qadr_np = np.asarray(m.jnt_qposadr)

  for ids in mk.levels:
    par = np.asarray(m.body_parentid)[ids]
    pquat = xquat[par]                                    # (L, 4)
    pos = xpos[par] + math.quat_rot(pquat, body_pos[ids])
    quat = math.quat_mul(pquat, body_quat[ids])

    kmax = int(jnum_np[ids].max()) if len(ids) else 0
    for k in range(kmax):
      has = jnum_np[ids] > k                              # (L,) static
      j_ids = np.where(has, jadr_np[ids] + k, 0)
      jt = jtype_np[j_ids]
      qadr = qadr_np[j_ids]
      ax0 = jnt_axis[j_ids]                               # (L, 3)
      jp = jnt_pos[j_ids]
      qv = qpos[qadr]                                     # (L,)
      q0 = qpos0[qadr]

      is_h = (jt == JointType.HINGE) & has
      is_s = (jt == JointType.SLIDE) & has
      is_f = (jt == JointType.FREE) & has
      h1 = jnp.asarray(is_h[:, None])
      s1 = jnp.asarray(is_s[:, None])
      f1 = jnp.asarray(is_f[:, None])

      # hinge
      anchor_h = pos + math.quat_rot(quat, jp)
      axis_w = math.quat_rot(quat, ax0)                   # hinge & slide
      qloc = math.axis_angle_to_quat(ax0, qv - q0)
      quat_h = math.quat_mul(quat, qloc)
      pos_h = anchor_h - math.quat_rot(quat_h, jp)
      # slide
      pos_s = pos + axis_w * (qv - q0)[:, None]
      anchor_s = pos_s + math.quat_rot(quat, jp)
      # free (only ever the single joint of its body)
      if np.any(is_f):
        pos_f = qpos[qadr[:, None] + np.array([0, 1, 2])]
        quat_f = math.normalize(qpos[qadr[:, None] + np.array([3, 4, 5, 6])])
      else:
        pos_f, quat_f = pos, quat

      pos = jnp.where(h1, pos_h, jnp.where(s1, pos_s,
                      jnp.where(f1, pos_f, pos)))
      quat = jnp.where(h1, quat_h, jnp.where(f1, quat_f, quat))

      anchor = jnp.where(h1, anchor_h, jnp.where(s1, anchor_s, pos_f))
      axis = jnp.where(jnp.asarray((is_h | is_s))[:, None], axis_w, ax0)
      # scatter joint outputs; inactive rows target index njnt -> dropped
      tgt = jnp.asarray(np.where(has, j_ids, m.njnt))
      xanchor = xanchor.at[tgt].set(anchor, mode="drop")
      xaxis = xaxis.at[tgt].set(axis, mode="drop")

    xpos = xpos.at[np.asarray(ids)].set(pos)
    xquat = xquat.at[np.asarray(ids)].set(quat)

  xmat = math.quat_to_mat(xquat)
  if not m.njnt:
    xanchor = jnp.zeros((0, 3), dt)
    xaxis = jnp.zeros((0, 3), dt)

  # inertial frames
  xipos = xpos + math.quat_rot(xquat, _cast(m.body_ipos, dt))
  ximat = math.quat_to_mat(math.quat_mul(xquat, _cast(m.body_iquat, dt)))

  # geoms / sites (vectorized gathers)
  gb = m.geom_bodyid
  geom_xpos = xpos[gb] + math.quat_rot(xquat[gb], _cast(m.geom_pos, dt))
  geom_xmat = math.quat_to_mat(
      math.quat_mul(xquat[gb], _cast(m.geom_quat, dt)))
  if m.nsite:
    sb = m.site_bodyid
    site_xpos = xpos[sb] + math.quat_rot(xquat[sb], _cast(m.site_pos, dt))
    site_xmat = math.quat_to_mat(
        math.quat_mul(xquat[sb], _cast(m.site_quat, dt)))
  else:
    site_xpos = jnp.zeros((0, 3), dt)
    site_xmat = jnp.zeros((0, 3, 3), dt)

  return d.replace(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      site_xpos=site_xpos, site_xmat=site_xmat)


# ---------------------------------------------------------------------------
# CoM-based quantities (mj_comPos contract)
# ---------------------------------------------------------------------------

def com_pos(m: Model, d: Data) -> Data:
  dt = d.qpos.dtype
  mk = masks(m)

  mass = _cast(m.body_mass, dt)
  # subtree center of mass: one matmul over the subtree mask
  moment = mass[:, None] * d.xipos                        # (nbody, 3)
  sub_moment = _cast(mk.body_subtree, dt) @ moment        # (nbody, 3)
  sub_mass = jnp.maximum(_cast(m.body_subtreemass, dt), 1e-15)
  subtree_com = sub_moment / sub_mass[:, None]

  # cinert: body spatial inertia about subtree_com[rootid[b]], world axes
  root_com = subtree_com[m.body_rootid]                   # (nbody, 3)
  R = d.ximat                                             # (nbody, 3, 3)
  I_diag = _cast(m.body_inertia, dt)                      # (nbody, 3)
  I_w = jnp.einsum('bij,bj,bkj->bik', R, I_diag, R)       # R diag(I) R^T
  off = d.xipos - root_com                                # (nbody, 3)
  dsq = jnp.sum(off * off, axis=-1)
  outer = off[:, :, None] * off[:, None, :]
  shift = mass[:, None, None] * (
      dsq[:, None, None] * jnp.eye(3, dtype=dt)[None] - outer)
  I_o = I_w + shift
  cinert = jnp.concatenate(
      [
          I_o[:, 0, 0, None], I_o[:, 1, 1, None], I_o[:, 2, 2, None],
          I_o[:, 0, 1, None], I_o[:, 0, 2, None], I_o[:, 1, 2, None],
          mass[:, None] * off, mass[:, None],
      ],
      axis=-1,
  )

  # cdof for each dof, expressed at the root subtree com.
  # Vectorized over joints: hinge/slide dofs come from one batched
  # cross-product + scatter (74 sequential .at updates otherwise dominate
  # this stage); only free-joint blocks (1 per model) stay per-joint.
  cdof = jnp.zeros((m.nv, 6), dt)
  hs = [j for j in range(m.njnt)
        if int(m.jnt_type[j]) in (JointType.HINGE, JointType.SLIDE)]
  other = [j for j in range(m.njnt)
           if int(m.jnt_type[j]) not in
           (JointType.HINGE, JointType.SLIDE, JointType.FREE)]
  if other:
    raise NotImplementedError(
        f"joint types {[int(m.jnt_type[j]) for j in other]}")
  if hs:
    jidx = np.asarray(hs, np.int32)
    vadrs = m.jnt_dofadr[jidx]
    bodies = m.body_rootid[m.jnt_bodyid[jidx]]
    is_hinge = (m.jnt_type[jidx] == JointType.HINGE)[:, None]
    ax = d.xaxis[jidx]                                    # (J, 3)
    o = subtree_com[bodies]                               # (J, 3)
    lin_h = jnp.cross(ax, o - d.xanchor[jidx])
    ang = jnp.where(jnp.asarray(is_hinge), ax, 0.0)
    lin = jnp.where(jnp.asarray(is_hinge), lin_h, ax)
    # static one-hot placement instead of a batched scatter (vmapped
    # scatters lower poorly on TPU; this is one small MXU matmul)
    P = np.zeros((m.nv, len(hs)), np.float64)
    P[vadrs, np.arange(len(hs))] = 1.0
    cdof = _cast(P, dt) @ jnp.concatenate([ang, lin], axis=1)
  for j in range(m.njnt):
    if int(m.jnt_type[j]) != JointType.FREE:
      continue
    vadr = int(m.jnt_dofadr[j])
    b = int(m.jnt_bodyid[j])
    o = subtree_com[m.body_rootid[b]]
    # translation dofs: world axes
    eye = jnp.eye(3, dtype=dt)
    trans = jnp.concatenate([jnp.zeros((3, 3), dt), eye], axis=1)
    # rotation dofs: body-frame axes (columns of xmat), anchored at xpos
    axes = d.xmat[b].T                                    # rows = body axes
    lin = jnp.cross(axes, (o - d.xpos[b])[None])
    rot = jnp.concatenate([axes, lin], axis=1)
    cdof = jax.lax.dynamic_update_slice(
        cdof, jnp.concatenate([trans, rot], axis=0), (vadr, 0))

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


# ---------------------------------------------------------------------------
# CRB mass matrix (mj_crb + mj_factorM contract, dense jacobian=0 layout)
# ---------------------------------------------------------------------------

def crb(m: Model, d: Data, factor: bool = True) -> Data:
  dt = d.qpos.dtype
  mk = masks(m)

  # composite inertia: sum cinert over each subtree (same reference point
  # within a kinematic root, so the 10-vectors add linearly)
  crb_inert = _cast(mk.body_subtree, dt) @ d.cinert       # (nbody, 10)

  F = math.inert_mul(crb_inert[m.dof_bodyid], d.cdof)     # (nv, 6)
  full = d.cdof @ F.T                                     # (nv, nv) MXU
  upper = full * _cast(mk.qm_upper, dt)
  qM = upper + upper.T - jnp.diag(jnp.diag(upper))
  qM = qM + jnp.diag(_cast(m.dof_armature, dt))

  d = d.replace(qM=qM)
  if factor:
    d = factor_m(m, d)
  return d


def factor_m(m: Model, d: Data) -> Data:
  """Cache the explicit M^{-1} (Pallas fused factor+invert on TPU).

  The CG preconditioner, qacc_smooth, and derived-constant computation
  all consume M^{-1}·x; with the huge env batch and tiny nv, one fused
  inversion + MXU matvecs beats repeated batched triangular solves
  (XLA's are the hottest op in the substep otherwise)."""
  from brax_rodent_run_tpu.ops.cholesky import spd_inverse
  return d.replace(qMinv=spd_inverse(d.qM))


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """M^{-1} x via the cached inverse. x: (..., nv) or (nv,)."""
  return x @ d.qMinv.T if x.ndim > 1 else d.qMinv @ x


# ---------------------------------------------------------------------------
# CoM velocities (mj_comVel contract)
# ---------------------------------------------------------------------------

def com_vel(m: Model, d: Data) -> Data:
  dt = d.qpos.dtype
  mk = masks(m)

  scaled = d.cdof * d.qvel[:, None]                       # (nv, 6)
  cvel = _cast(mk.body_dof_ancestor, dt) @ scaled         # (nbody, 6)
  v_partial = _cast(mk.cdof_dot_mask, dt) @ scaled  # (nv, 6)
  cdof_dot = math.motion_cross(v_partial, d.cdof)
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# RNE bias forces (mj_rne contract, flg_acc=0)
# ---------------------------------------------------------------------------

def rne(m: Model, d: Data) -> Data:
  dt = d.qpos.dtype
  mk = masks(m)

  gravity = _cast(np.array(m.opt.gravity), dt)
  if m.opt.disableflags & DisableBit.GRAVITY:
    gravity = jnp.zeros(3, dt)
  cacc0 = jnp.concatenate([jnp.zeros(3, dt), -gravity])

  # cacc[b] = cacc0 + sum_{ancestor dofs j} cdof_dot[j] * qvel[j]
  scaled = d.cdof_dot * d.qvel[:, None]
  cacc = cacc0[None, :] + _cast(mk.body_dof_ancestor, dt) @ scaled

  # per-body net force: I*a + v x* (I*v)
  Iv = math.inert_mul(d.cinert, d.cvel)
  cfrc = math.inert_mul(d.cinert, cacc) + math.force_cross(d.cvel, Iv)

  # accumulate subtree forces, project onto dofs
  cfrc_total = _cast(mk.body_subtree, dt) @ cfrc          # (nbody, 6)
  qfrc_bias = jnp.sum(d.cdof * cfrc_total[m.dof_bodyid], axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# Tendons (fixed/joint tendons: rodent_cpu.xml:505-560)
# ---------------------------------------------------------------------------

def tendon(m: Model, d: Data) -> Data:
  if not m.ntendon:
    return d
  dt = d.qpos.dtype
  # static jacobian: fixed tendons are linear in hinge/slide qpos
  J = np.zeros((m.ntendon, m.nv))
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    for w in range(adr, adr + num):
      jid = int(m.wrap_jntid[w])
      J[t, int(m.jnt_dofadr[jid])] = float(m.wrap_coef[w])
  ten_J = _cast(J, dt)
  # length uses qpos at the joint qpos addresses (same linear form)
  Jq = np.zeros((m.ntendon, m.nq))
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    for w in range(adr, adr + num):
      jid = int(m.wrap_jntid[w])
      Jq[t, int(m.jnt_qposadr[jid])] = float(m.wrap_coef[w])
  ten_length = _cast(Jq, dt) @ d.qpos
  ten_velocity = ten_J @ d.qvel
  return d.replace(ten_length=ten_length, ten_velocity=ten_velocity,
                   ten_J=ten_J)


# ---------------------------------------------------------------------------
# Actuator transmission (mj_transmission contract)
# ---------------------------------------------------------------------------

def transmission(m: Model, d: Data) -> Data:
  if not m.nu:
    return d
  dt = d.qpos.dtype
  length = jnp.zeros(m.nu, dt)
  moment = jnp.zeros((m.nu, m.nv), dt)
  for u in range(m.nu):
    trn = int(m.actuator_trntype[u])
    gear0 = float(m.actuator_gear[u, 0])
    if trn == TrnType.JOINT:
      j = int(m.actuator_trnid[u, 0])
      qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      jtype = int(m.jnt_type[j])
      if jtype in (JointType.HINGE, JointType.SLIDE):
        length = length.at[u].set(d.qpos[qadr] * gear0)
        moment = moment.at[u, vadr].set(gear0)
      elif jtype == JointType.FREE:
        # wrench in body frame through gear (6,)
        gear = _cast(m.actuator_gear[u], dt)
        # length is zero for free joints
        ang = math.quat_rot(d.xquat[m.jnt_bodyid[j]], gear[3:])
        mom = jnp.concatenate([gear[:3], ang])
        moment = jax.lax.dynamic_update_slice(moment, mom[None], (u, vadr))
      else:
        raise NotImplementedError
    elif trn == TrnType.TENDON:
      t = int(m.actuator_trnid[u, 0])
      length = length.at[u].set(d.ten_length[t] * gear0)
      moment = moment.at[u].set(d.ten_J[t] * gear0)
    else:
      raise NotImplementedError(f"transmission type {trn}")
  velocity = moment @ d.qvel
  return d.replace(actuator_length=length, actuator_moment=moment,
                   actuator_velocity=velocity)


# ---------------------------------------------------------------------------
# Passive forces (mj_passive contract: springs + dampers)
# ---------------------------------------------------------------------------

def passive(m: Model, d: Data) -> Data:
  dt = d.qpos.dtype
  spring_on = not (m.opt.disableflags & DisableBit.SPRING)
  damper_on = not (m.opt.disableflags & DisableBit.DAMPER)
  if not spring_on and not damper_on:
    z = jnp.zeros(m.nv, dt)
    return d.replace(qfrc_spring=z, qfrc_damper=z, qfrc_passive=z)

  qfrc_spring = jnp.zeros(m.nv, dt)
  qpos_spring = _cast(m.qpos_spring, dt)
  for j in range(m.njnt):
    stiff = float(m.jnt_stiffness[j]) if spring_on else 0.0
    if stiff == 0.0:
      continue
    jtype = int(m.jnt_type[j])
    qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jtype in (JointType.HINGE, JointType.SLIDE):
      qfrc_spring = qfrc_spring.at[vadr].set(
          -stiff * (d.qpos[qadr] - qpos_spring[qadr]))
    elif jtype == JointType.FREE:
      dif = d.qpos[qadr:qadr + 3] - qpos_spring[qadr:qadr + 3]
      qfrc_spring = jax.lax.dynamic_update_slice(
          qfrc_spring, -stiff * dif, (vadr,))
      rot = math.quat_sub(d.qpos[qadr + 3:qadr + 7],
                          qpos_spring[qadr + 3:qadr + 7])
      qfrc_spring = jax.lax.dynamic_update_slice(
          qfrc_spring, -stiff * rot, (vadr + 3,))

  qfrc_damper = (-_cast(m.dof_damping, dt) * d.qvel if damper_on
                 else jnp.zeros(m.nv, dt))

  # tendon springs/dampers
  if m.ntendon:
    lspring = _cast(m.tendon_lengthspring, dt)
    if spring_on:
      ts = _cast(m.tendon_stiffness, dt)
      below = jnp.minimum(d.ten_length - lspring[:, 0], 0.0)
      above = jnp.maximum(d.ten_length - lspring[:, 1], 0.0)
      qfrc_spring = qfrc_spring + d.ten_J.T @ (-ts * (below + above))
    if damper_on:
      td = _cast(m.tendon_damping, dt)
      qfrc_damper = qfrc_damper + d.ten_J.T @ (-td * d.ten_velocity)

  return d.replace(qfrc_spring=qfrc_spring, qfrc_damper=qfrc_damper,
                   qfrc_passive=qfrc_spring + qfrc_damper)


# ---------------------------------------------------------------------------
# Actuation (mj_fwdActuation contract: filter dynamics + affine gain/bias)
# ---------------------------------------------------------------------------

def fwd_actuation(m: Model, d: Data) -> Data:
  dt = d.qpos.dtype
  if not m.nu or (m.opt.disableflags & DisableBit.ACTUATION):
    return d.replace(qfrc_actuator=jnp.zeros(m.nv, dt),
                     actuator_force=jnp.zeros(m.nu, dt),
                     act_dot=jnp.zeros(m.na, dt))

  ctrl = d.ctrl
  if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
    crange = _cast(m.actuator_ctrlrange, dt)
    limited = _cast(m.actuator_ctrllimited, bool)
    ctrl = jnp.where(limited,
                     jnp.clip(ctrl, crange[:, 0], crange[:, 1]), ctrl)

  # activation dynamics
  act_dot = jnp.zeros(m.na, dt)
  act_input = jnp.zeros(m.nu, dt)  # per-actuator input to force law
  for u in range(m.nu):
    dyn = int(m.actuator_dyntype[u])
    aadr = int(m.actuator_actadr[u])
    if dyn == DynType.NONE:
      act_input = act_input.at[u].set(ctrl[u])
    elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
      tau = max(float(m.actuator_dynprm[u, 0]), 1e-15)
      act_dot = act_dot.at[aadr].set((ctrl[u] - d.act[aadr]) / tau)
      act_input = act_input.at[u].set(d.act[aadr])
    elif dyn == DynType.INTEGRATOR:
      act_dot = act_dot.at[aadr].set(ctrl[u])
      act_input = act_input.at[u].set(d.act[aadr])
    else:
      raise NotImplementedError(f"dyn type {dyn}")

  gainprm = _cast(m.actuator_gainprm, dt)
  biasprm = _cast(m.actuator_biasprm, dt)
  # gain (FIXED only in the reference envelope; AFFINE for generality)
  gain = jnp.where(_cast(m.actuator_gaintype, jnp.int32) == GainType.FIXED,
                   gainprm[:, 0],
                   gainprm[:, 0] + gainprm[:, 1] * d.actuator_length
                   + gainprm[:, 2] * d.actuator_velocity)
  bias = jnp.where(_cast(m.actuator_biastype, jnp.int32) == BiasType.AFFINE,
                   biasprm[:, 0] + biasprm[:, 1] * d.actuator_length
                   + biasprm[:, 2] * d.actuator_velocity,
                   jnp.zeros(m.nu, dt))
  force = gain * act_input + bias

  frange = _cast(m.actuator_forcerange, dt)
  flimited = _cast(m.actuator_forcelimited, bool)
  force = jnp.where(flimited, jnp.clip(force, frange[:, 0], frange[:, 1]),
                    force)

  qfrc_actuator = d.actuator_moment.T @ force
  return d.replace(actuator_force=force, act_dot=act_dot,
                   qfrc_actuator=qfrc_actuator)


# ---------------------------------------------------------------------------
# Smooth acceleration
# ---------------------------------------------------------------------------

def fwd_acceleration(m: Model, d: Data) -> Data:
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + d.qfrc_applied)
  qacc_smooth = solve_m(m, d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
