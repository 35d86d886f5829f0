"""Sensor evaluation (mj_sensorVel / mj_sensorAcc contract).

Covers the sensor set the reference models declare
(rodent_optimized.xml:573-582): accelerometer, velocimeter, gyro on the
head site, four touch sensors on box sites (palms/soles), and
subtreelinvel on the torso. The reference never reads sensordata in its
training path (obs is assembled from qpos/qvel/cinert/cvel/qfrc_actuator,
Rodent_Env_Brax.py:149-158) but MJX computes it as part of ``mjx.step``,
so parity requires it and downstream users expect ``d.sensordata``.

Split mirrors MuJoCo's staging:

- ``sensor_vel``: velocity-stage sensors (velocimeter, gyro,
  subtreelinvel) — needs cvel, runs after fwd_velocity.
- ``sensor_acc``: acceleration-stage sensors (accelerometer, touch) —
  needs qacc and efc_force, runs after the constraint solve. The
  body-acceleration pass is the cacc part of mj_rnePostConstraint,
  expressed as one static-mask matmul over the dof-ancestor table.

Everything is fixed-shape and branch-free; per-sensor python loops are
unrolled at trace time (nsensor is static and small).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import (
    Data, DisableBit, GeomType, Model, SensorType)


def _enabled(m: Model) -> bool:
  return m.nsensor > 0 and not (m.opt.disableflags & DisableBit.SENSOR)


def _site_velocity(m: Model, d: Data, site: int):
  """(ang, lin) spatial velocity of the site's body at the site, in the
  site frame (mj_objectVelocity(mjOBJ_SITE, flg_local=1))."""
  b = int(m.site_bodyid[site])
  cvel = d.cvel[b]
  ang, lin = cvel[:3], cvel[3:]
  oldpos = d.subtree_com[m.body_rootid[b]]
  pos = d.site_xpos[site]
  lin = lin + jnp.cross(ang, pos - oldpos)
  rot = d.site_xmat[site]                       # local->world
  return rot.T @ ang, rot.T @ lin


def _body_cacc(m: Model, d: Data) -> jax.Array:
  """Per-body spatial acceleration at the root subtree com (the cacc part
  of mj_rnePostConstraint): gravity baseline + ancestor-dof propagation of
  cdof_dot*qvel + cdof*qacc."""
  dt = d.qpos.dtype
  mk = masks(m)
  gravity = jnp.asarray(np.array(m.opt.gravity), dt)
  if m.opt.disableflags & DisableBit.GRAVITY:
    gravity = jnp.zeros(3, dt)
  cacc0 = jnp.concatenate([jnp.zeros(3, dt), -gravity])
  scaled = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
  return cacc0[None, :] + jnp.asarray(mk.body_dof_ancestor, dt) @ scaled


def _contact_normal_force(m: Model, d: Data) -> jax.Array:
  """Per contact-point normal force (ncon,): sum of that point's pyramid
  rows (each pyramid direction has unit normal coefficient, so the normal
  component of the decoded cone force is the plain row sum —
  mju_decodePyramid semantics)."""
  from brax_rodent_run_tpu.physics.constraint import efc_layout
  lay = efc_layout(m)
  ncon = m.ncon_max
  if ncon == 0 or lay.ncon_rows == 0:
    return jnp.zeros((ncon,), d.qpos.dtype)
  rows = d.efc_force[lay.nlimit:]
  seg = jnp.asarray(lay.con_id, jnp.int32)
  return jax.ops.segment_sum(rows, seg, num_segments=ncon)


def _inside_site(m: Model, site: int, pos: jax.Array, xpos, xmat):
  """Is world point ``pos`` (ncon, 3) inside the site volume
  (mju_insideGeom for the primitive site types)."""
  local = (pos - xpos[None]) @ xmat             # world -> site frame
  size = np.asarray(m.site_size[site], np.float64)
  t = int(m.site_type[site])
  if t == GeomType.SPHERE:
    return jnp.sum(local * local, -1) <= size[0] ** 2
  if t == GeomType.BOX:
    return jnp.all(jnp.abs(local) <= jnp.asarray(size, local.dtype), -1)
  if t == GeomType.CAPSULE:
    z = jnp.clip(local[:, 2], -size[1], size[1])
    dp = local - jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
    return jnp.sum(dp * dp, -1) <= size[0] ** 2
  if t == GeomType.CYLINDER:
    inz = jnp.abs(local[:, 2]) <= size[1]
    inr = local[:, 0] ** 2 + local[:, 1] ** 2 <= size[0] ** 2
    return inz & inr
  if t == GeomType.ELLIPSOID:
    s = jnp.asarray(size, local.dtype)
    return jnp.sum((local / s) ** 2, -1) <= 1.0
  # unknown site volume: fall back to body-match only
  return jnp.ones(pos.shape[:1], bool)


def sensor_vel(m: Model, d: Data) -> Data:
  """Velocity-stage sensors: velocimeter, gyro, subtreelinvel."""
  if not _enabled(m):
    return d
  dt = d.qpos.dtype
  sd = d.sensordata

  types = [int(t) for t in m.sensor_type]
  subtree_linvel = None
  if SensorType.SUBTREELINVEL in types:
    # mj_subtreeVel: subtree momentum / subtree mass, with per-body linear
    # velocity taken at the body CoM (xipos)
    mk = masks(m)
    mass = jnp.asarray(m.body_mass, dt)
    ang = d.cvel[:, :3]
    lin = d.cvel[:, 3:]
    root_com = d.subtree_com[m.body_rootid]
    v_com = lin + jnp.cross(ang, d.xipos - root_com)
    mom = jnp.asarray(mk.body_subtree, dt) @ (mass[:, None] * v_com)
    subtree_linvel = mom / jnp.maximum(
        jnp.asarray(m.body_subtreemass, dt), 1e-15)[:, None]

  for i in range(m.nsensor):
    st, obj, adr = types[i], int(m.sensor_objid[i]), int(m.sensor_adr[i])
    if st == SensorType.GYRO:
      ang, _ = _site_velocity(m, d, obj)
      sd = jax.lax.dynamic_update_slice(sd, ang, (adr,))
    elif st == SensorType.VELOCIMETER:
      _, lin = _site_velocity(m, d, obj)
      sd = jax.lax.dynamic_update_slice(sd, lin, (adr,))
    elif st == SensorType.SUBTREELINVEL:
      sd = jax.lax.dynamic_update_slice(sd, subtree_linvel[obj], (adr,))
  return d.replace(sensordata=sd)


def sensor_acc(m: Model, d: Data) -> Data:
  """Acceleration-stage sensors: accelerometer, touch."""
  if not _enabled(m):
    return d
  types = [int(t) for t in m.sensor_type]
  stage = {SensorType.ACCELEROMETER, SensorType.TOUCH}
  if not any(t in stage for t in types):
    return d

  sd = d.sensordata
  cacc = (_body_cacc(m, d)
          if SensorType.ACCELEROMETER in types else None)
  nforce = (_contact_normal_force(m, d)
            if SensorType.TOUCH in types else None)

  if nforce is not None:
    from brax_rodent_run_tpu.physics.constraint import efc_layout
    lay = efc_layout(m)

  for i in range(m.nsensor):
    st, obj, adr = types[i], int(m.sensor_objid[i]), int(m.sensor_adr[i])
    if st == SensorType.ACCELEROMETER:
      # mj_objectAcceleration(flg_local=1) + the d(rot)/dt correction term
      b = int(m.site_bodyid[obj])
      acc = cacc[b]
      aang, alin = acc[:3], acc[3:]
      oldpos = d.subtree_com[m.body_rootid[b]]
      pos = d.site_xpos[obj]
      alin = alin + jnp.cross(aang, pos - oldpos)
      rot = d.site_xmat[obj]
      ang_l, lin_l = _site_velocity(m, d, obj)
      acc_l = rot.T @ alin + jnp.cross(ang_l, lin_l)
      sd = jax.lax.dynamic_update_slice(sd, acc_l, (adr,))
    elif st == SensorType.TOUCH:
      b = int(m.site_bodyid[obj])
      body_match = jnp.asarray(
          (lay.con_body1 == b) | (lay.con_body2 == b))
      inside = _inside_site(m, obj, d.contact.pos,
                            d.site_xpos[obj], d.site_xmat[obj])
      total = jnp.sum(jnp.where(body_match & inside, nforce, 0.0))
      sd = sd.at[adr].set(total)
  return d.replace(sensordata=sd)
