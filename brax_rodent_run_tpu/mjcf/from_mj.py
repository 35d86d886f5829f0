"""Interop: build our ``Model`` from a compiled ``mujoco.MjModel``.

This gives users of the reference (which loads models via
``mujoco.MjModel.from_xml_path``, Rodent_Env_Brax.py:41) a drop-in path into
this framework, and gives our test-suite a ground-truth construction to diff
the native MJCF compiler (``brax_rodent_run_tpu.mjcf.compiler``) against.

Only imports ``mujoco`` lazily — the TPU runtime path never needs it.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from brax_rodent_run_tpu.physics.types import (
    ContactSlot, DisableBit, GeomType, JointType, Model, Option, SolverType)

# Max contact points our narrowphase emits per geom-type pair.
_PLANE = int(GeomType.PLANE)
_SPHERE = int(GeomType.SPHERE)
_CAPSULE = int(GeomType.CAPSULE)
_ELLIPSOID = int(GeomType.ELLIPSOID)
_CYLINDER = int(GeomType.CYLINDER)
_BOX = int(GeomType.BOX)

_MAX_POINTS = {
    (_PLANE, _SPHERE): 1,
    (_PLANE, _CAPSULE): 2,
    (_PLANE, _ELLIPSOID): 1,
    (_PLANE, _CYLINDER): 3,
    (_PLANE, _BOX): 4,
    (_SPHERE, _SPHERE): 1,
    (_SPHERE, _CAPSULE): 1,
    (_SPHERE, _ELLIPSOID): 1,
    (_SPHERE, _BOX): 1,
    (_CAPSULE, _CAPSULE): 1,
    (_CAPSULE, _ELLIPSOID): 1,
    (_CAPSULE, _BOX): 2,
    (_ELLIPSOID, _ELLIPSOID): 1,
    (_ELLIPSOID, _BOX): 1,
    (_BOX, _BOX): 1,
}


def _mix_params(m, g1: int, g2: int):
  """Static contact-parameter mixing (mj_contactParam semantics)."""
  p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
  f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
  if p1 != p2:
    g = g1 if p1 > p2 else g2
    condim = int(m.geom_condim[g])
    fri = m.geom_friction[g]
    solref = np.array(m.geom_solref[g])
    solimp = np.array(m.geom_solimp[g])
  else:
    condim = int(max(m.geom_condim[g1], m.geom_condim[g2]))
    # solmix weights
    s1, s2 = float(m.geom_solmix[g1]), float(m.geom_solmix[g2])
    if s1 >= 1e-15 and s2 >= 1e-15:
      w1 = s1 / (s1 + s2)
    elif s1 < 1e-15 and s2 < 1e-15:
      w1 = 0.5
    elif s1 < 1e-15:
      w1 = 0.0
    else:
      w1 = 1.0
    r1, r2 = m.geom_solref[g1], m.geom_solref[g2]
    if r1[0] > 0 and r2[0] > 0:
      solref = w1 * r1 + (1 - w1) * r2
    else:
      solref = np.minimum(r1, r2)
    solimp = w1 * m.geom_solimp[g1] + (1 - w1) * m.geom_solimp[g2]
    fri = np.maximum(f1, f2)
  friction5 = (float(fri[0]), float(fri[0]), float(fri[1]),
               float(fri[2]), float(fri[2]))
  margin = float(max(m.geom_margin[g1], m.geom_margin[g2]))
  gap = float(max(m.geom_gap[g1], m.geom_gap[g2]))
  return condim, friction5, tuple(solref.tolist()), tuple(solimp.tolist()), margin, gap


def _make_slot(m, g1: int, g2: int, pairid: int = -1,
               strict: bool = False) -> ContactSlot | None:
  t1, t2 = int(m.geom_type[g1]), int(m.geom_type[g2])
  if (t1, t2) not in _MAX_POINTS and (t2, t1) in _MAX_POINTS:
    g1, g2, t1, t2 = g2, g1, t2, t1
  if (t1, t2) not in _MAX_POINTS:
    msg = (f"no narrowphase for geom type pair ({GeomType(t1).name},"
           f" {GeomType(t2).name})")
    if strict:
      raise NotImplementedError(msg)
    import warnings
    warnings.warn(msg + " — dropping pair", stacklevel=2)
    return None
  if pairid >= 0:
    condim = int(m.pair_dim[pairid])
    friction5 = tuple(np.asarray(m.pair_friction[pairid], np.float64).tolist())
    solref = tuple(np.asarray(m.pair_solref[pairid], np.float64).tolist())
    solimp = tuple(np.asarray(m.pair_solimp[pairid], np.float64).tolist())
    margin = float(m.pair_margin[pairid])
    gap = float(m.pair_gap[pairid])
  else:
    condim, friction5, solref, solimp, margin, gap = _mix_params(m, g1, g2)
  return ContactSlot(
      geom1=int(g1), geom2=int(g2), type1=t1, type2=t2,
      max_points=_MAX_POINTS[(t1, t2)], condim=condim, friction=friction5,
      solref=solref, solimp=solimp, margin=margin, gap=gap)


def build_contact_slots(m) -> Tuple[ContactSlot, ...]:
  """Compile the static collision pair table.

  Mirrors MuJoCo broadphase admission rules (same-body / weld / parent
  filtering with the world exception, contype&conaffinity masks, explicit
  pair/exclude lists). Geom positions never change which pairs *may* collide,
  so the table is static — narrowphase just evaluates every slot and masks.
  """
  slots: List[ContactSlot] = []

  # explicit <pair> entries first (mj_collision processes pairs separately)
  for p in range(m.npair):
    g1, g2 = int(m.pair_geom1[p]), int(m.pair_geom2[p])
    s = _make_slot(m, g1, g2, pairid=p)
    if s is not None:
      slots.append(s)

  excluded = set()
  for e in range(m.nexclude):
    sig = int(m.exclude_signature[e])
    # signature = body1 << 16 | body2
    excluded.add((sig >> 16, sig & 0xFFFF))
    excluded.add((sig & 0xFFFF, sig >> 16))

  pair_geoms = {(int(m.pair_geom1[p]), int(m.pair_geom2[p]))
                for p in range(m.npair)}
  pair_geoms |= {(b, a) for a, b in pair_geoms}

  filterparent = not (m.opt.disableflags & int(DisableBit.FILTERPARENT))

  for g1 in range(m.ngeom):
    for g2 in range(g1 + 1, m.ngeom):
      if (g1, g2) in pair_geoms:
        continue
      b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
      w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
      if w1 == w2:
        continue
      if (b1, b2) in excluded:
        continue
      # parent filtering (world exception)
      wp1 = int(m.body_weldid[m.body_parentid[w1]])
      wp2 = int(m.body_weldid[m.body_parentid[w2]])
      if filterparent and w1 != 0 and w2 != 0 and (w1 == wp2 or w2 == wp1):
        continue
      ct1, ca1 = int(m.geom_contype[g1]), int(m.geom_conaffinity[g1])
      ct2, ca2 = int(m.geom_contype[g2]), int(m.geom_conaffinity[g2])
      if not ((ct1 & ca2) or (ct2 & ca1)):
        continue
      s = _make_slot(m, g1, g2)
      if s is not None:
        slots.append(s)
  return tuple(slots)


def from_mj_model(mj) -> Model:
  """Convert a mujoco.MjModel into our immutable Model."""
  import mujoco

  def names(obj_enum, n):
    return tuple(
        mujoco.mj_id2name(mj, obj_enum, i) or f"#{i}" for i in range(n))

  f = lambda x: np.array(x, dtype=np.float64)
  i = lambda x: np.array(x, dtype=np.int32)

  opt = Option(
      timestep=float(mj.opt.timestep),
      gravity=tuple(np.asarray(mj.opt.gravity).tolist()),
      solver=SolverType(int(mj.opt.solver)),
      iterations=int(mj.opt.iterations),
      ls_iterations=int(mj.opt.ls_iterations),
      tolerance=float(mj.opt.tolerance),
      ls_tolerance=float(mj.opt.ls_tolerance),
      impratio=float(mj.opt.impratio),
      disableflags=int(mj.opt.disableflags),
      cone=int(mj.opt.cone),
  )

  model = Model(
      nq=mj.nq, nv=mj.nv, nu=mj.nu, na=mj.na, nbody=mj.nbody, njnt=mj.njnt,
      ngeom=mj.ngeom, nsite=mj.nsite, ntendon=mj.ntendon, nwrap=mj.nwrap,
      nsensor=mj.nsensor, nsensordata=mj.nsensordata, nkey=mj.nkey,
      opt=opt,
      qpos0=f(mj.qpos0), qpos_spring=f(mj.qpos_spring),
      body_parentid=i(mj.body_parentid), body_rootid=i(mj.body_rootid),
      body_weldid=i(mj.body_weldid),
      body_jntadr=i(mj.body_jntadr), body_jntnum=i(mj.body_jntnum),
      body_dofadr=i(mj.body_dofadr), body_dofnum=i(mj.body_dofnum),
      body_geomadr=i(mj.body_geomadr), body_geomnum=i(mj.body_geomnum),
      body_pos=f(mj.body_pos), body_quat=f(mj.body_quat),
      body_ipos=f(mj.body_ipos), body_iquat=f(mj.body_iquat),
      body_mass=f(mj.body_mass), body_subtreemass=f(mj.body_subtreemass),
      body_inertia=f(mj.body_inertia), body_invweight0=f(mj.body_invweight0),
      jnt_type=i(mj.jnt_type), jnt_qposadr=i(mj.jnt_qposadr),
      jnt_dofadr=i(mj.jnt_dofadr), jnt_bodyid=i(mj.jnt_bodyid),
      jnt_limited=np.array(mj.jnt_limited, bool),
      jnt_solref=f(mj.jnt_solref), jnt_solimp=f(mj.jnt_solimp),
      jnt_pos=f(mj.jnt_pos), jnt_axis=f(mj.jnt_axis),
      jnt_stiffness=f(mj.jnt_stiffness), jnt_range=f(mj.jnt_range),
      jnt_margin=f(mj.jnt_margin),
      dof_bodyid=i(mj.dof_bodyid), dof_jntid=i(mj.dof_jntid),
      dof_parentid=i(mj.dof_parentid), dof_armature=f(mj.dof_armature),
      dof_damping=f(mj.dof_damping), dof_invweight0=f(mj.dof_invweight0),
      dof_frictionloss=f(mj.dof_frictionloss),
      geom_type=i(mj.geom_type), geom_bodyid=i(mj.geom_bodyid),
      geom_contype=i(mj.geom_contype), geom_conaffinity=i(mj.geom_conaffinity),
      geom_condim=i(mj.geom_condim), geom_priority=i(mj.geom_priority),
      geom_solmix=f(mj.geom_solmix), geom_solref=f(mj.geom_solref),
      geom_solimp=f(mj.geom_solimp), geom_size=f(mj.geom_size),
      geom_pos=f(mj.geom_pos), geom_quat=f(mj.geom_quat),
      geom_friction=f(mj.geom_friction), geom_margin=f(mj.geom_margin),
      geom_gap=f(mj.geom_gap),
      site_bodyid=i(mj.site_bodyid), site_pos=f(mj.site_pos),
      site_quat=f(mj.site_quat), site_size=f(mj.site_size),
      site_type=i(mj.site_type),
      tendon_adr=i(mj.tendon_adr), tendon_num=i(mj.tendon_num),
      tendon_limited=np.array(mj.tendon_limited, bool),
      tendon_range=f(mj.tendon_range),
      tendon_solref_lim=f(mj.tendon_solref_lim),
      tendon_solimp_lim=f(mj.tendon_solimp_lim),
      tendon_stiffness=f(mj.tendon_stiffness),
      tendon_damping=f(mj.tendon_damping),
      tendon_lengthspring=f(mj.tendon_lengthspring),
      tendon_length0=f(mj.tendon_length0),
      tendon_invweight0=f(mj.tendon_invweight0),
      wrap_jntid=i(mj.wrap_objid), wrap_coef=f(mj.wrap_prm),
      actuator_trntype=i(mj.actuator_trntype),
      actuator_dyntype=i(mj.actuator_dyntype),
      actuator_gaintype=i(mj.actuator_gaintype),
      actuator_biastype=i(mj.actuator_biastype),
      actuator_trnid=i(mj.actuator_trnid),
      actuator_actadr=i(mj.actuator_actadr),
      actuator_actnum=i(mj.actuator_actnum),
      actuator_ctrllimited=np.array(mj.actuator_ctrllimited, bool),
      actuator_forcelimited=np.array(mj.actuator_forcelimited, bool),
      actuator_dynprm=f(mj.actuator_dynprm),
      actuator_gainprm=f(mj.actuator_gainprm),
      actuator_biasprm=f(mj.actuator_biasprm),
      actuator_ctrlrange=f(mj.actuator_ctrlrange),
      actuator_forcerange=f(mj.actuator_forcerange),
      actuator_gear=f(mj.actuator_gear),
      actuator_acc0=f(mj.actuator_acc0),
      sensor_type=i(mj.sensor_type), sensor_objid=i(mj.sensor_objid),
      sensor_adr=i(mj.sensor_adr), sensor_dim=i(mj.sensor_dim),
      key_qpos=f(mj.key_qpos).reshape(mj.nkey, mj.nq),
      contact_slots=build_contact_slots(mj),
      body_names=names(mujoco.mjtObj.mjOBJ_BODY, mj.nbody),
      joint_names=names(mujoco.mjtObj.mjOBJ_JOINT, mj.njnt),
      geom_names=names(mujoco.mjtObj.mjOBJ_GEOM, mj.ngeom),
      site_names=names(mujoco.mjtObj.mjOBJ_SITE, mj.nsite),
      actuator_names=names(mujoco.mjtObj.mjOBJ_ACTUATOR, mj.nu),
      sensor_names=names(mujoco.mjtObj.mjOBJ_SENSOR, mj.nsensor),
      camera_names=names(mujoco.mjtObj.mjOBJ_CAMERA, mj.ncam),
      key_names=names(mujoco.mjtObj.mjOBJ_KEY, mj.nkey),
  )
  return model


def load_mj_path(xml_path: str, **opt_overrides) -> Model:
  """Compile an MJCF file through the MuJoCo C compiler and convert.

  ``opt_overrides`` mirror the reference's from-Python option overrides
  (Rodent_Env_Brax.py:42-49): solver ('cg'|'newton'), iterations,
  ls_iterations.
  """
  import mujoco
  mj = mujoco.MjModel.from_xml_path(xml_path)
  if 'solver' in opt_overrides:
    mj.opt.solver = {
        'cg': mujoco.mjtSolver.mjSOL_CG,
        'newton': mujoco.mjtSolver.mjSOL_NEWTON,
    }[opt_overrides['solver'].lower()]
  if 'iterations' in opt_overrides:
    mj.opt.iterations = opt_overrides['iterations']
  if 'ls_iterations' in opt_overrides:
    mj.opt.ls_iterations = opt_overrides['ls_iterations']
  return from_mj_model(mj)
