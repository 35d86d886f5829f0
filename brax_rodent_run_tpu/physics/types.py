"""Core physics types: immutable ``Model`` and per-step ``Data`` pytree.

Design (TPU-first):

- ``Model`` is a *static* frozen dataclass of host numpy arrays + python
  scalars. It is closed over by jitted step functions, so all structural
  indices (parent ids, dof addresses, collision pair tables, efc layout) are
  concrete at trace time and every array shape in the compiled program is
  static. Numeric parameter arrays are kept in float64 on host (for compiler
  parity tests against the MuJoCo C oracle) and become f32 XLA constants when
  traced.

- ``Data`` is a flax.struct pytree of jnp arrays — the only thing that flows
  through jit/vmap/scan. All contact/constraint arrays are fixed-size with
  activity masks (no dynamic shapes anywhere).

Field names deliberately mirror the MuJoCo/MJX vocabulary exercised by the
reference (SURVEY.md §2.3; e.g. Rodent_Env_Brax.py:149-158 reads qpos, qvel,
cinert, cvel, qfrc_actuator) so a reference user can map concepts 1:1.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import struct


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6


class DynType(enum.IntEnum):
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3


class GainType(enum.IntEnum):
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1
  MUSCLE = 2


class TrnType(enum.IntEnum):
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4


class SolverType(enum.IntEnum):
  PGS = 0
  CG = 1
  NEWTON = 2


class SensorType(enum.IntEnum):
  # subset exercised by the reference models (rodent_optimized.xml:573-582);
  # values match mujoco.mjtSensor (3.x)
  TOUCH = 0
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  SUBTREECOM = 35
  SUBTREELINVEL = 36


class DisableBit(enum.IntFlag):
  """Bit-for-bit match of mujoco.mjtDisableBit (3.x numbering: PASSIVE was
  split into SPRING and DAMPER, shifting every later bit up by one —
  getting this wrong silently remaps flags like WARMSTART onto
  FILTERPARENT when interoperating with mujoco.MjModel.opt.disableflags)."""
  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  SPRING = 1 << 5
  DAMPER = 1 << 6
  GRAVITY = 1 << 7
  CLAMPCTRL = 1 << 8
  WARMSTART = 1 << 9
  FILTERPARENT = 1 << 10
  ACTUATION = 1 << 11
  REFSAFE = 1 << 12
  SENSOR = 1 << 13
  MIDPHASE = 1 << 14
  EULERDAMP = 1 << 15
  # convenience alias (pre-3.x MJCF "passive" flag disables both)
  PASSIVE = SPRING | DAMPER


@dataclasses.dataclass(frozen=True)
class Option:
  """Physics options (mirrors mjOption subset the reference exercises)."""
  timestep: float = 0.002
  gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
  solver: SolverType = SolverType.NEWTON
  iterations: int = 100
  ls_iterations: int = 50
  tolerance: float = 1e-8
  ls_tolerance: float = 0.01
  impratio: float = 1.0
  disableflags: int = 0
  # cone: 0 = pyramidal (only cone the reference models use)
  cone: int = 0


@dataclasses.dataclass(frozen=True)
class ContactSlot:
  """Static per-collision-pair metadata compiled ahead of time.

  One slot covers one geom pair; the narrowphase for that pair emits
  ``max_points`` candidate contact points into consecutive contact rows.
  Contact parameters (condim/friction/solref/solimp) are mixed at compile
  time since geom params are static (mj_contactParam semantics).
  """
  geom1: int
  geom2: int
  type1: int
  type2: int
  max_points: int
  condim: int
  friction: Tuple[float, ...]     # 5
  solref: Tuple[float, float]
  solimp: Tuple[float, ...]       # 5
  margin: float
  gap: float


@dataclasses.dataclass(frozen=True, eq=False)
class Model:
  """Immutable compiled model. All arrays are host numpy; structure is static."""

  # ---- sizes
  nq: int
  nv: int
  nu: int
  na: int
  nbody: int
  njnt: int
  ngeom: int
  nsite: int
  ntendon: int
  nwrap: int
  nsensor: int
  nsensordata: int
  nkey: int

  # ---- options
  opt: Option

  # ---- qpos defaults
  qpos0: np.ndarray          # (nq,)
  qpos_spring: np.ndarray    # (nq,)

  # ---- bodies
  body_parentid: np.ndarray  # (nbody,) int
  body_rootid: np.ndarray    # (nbody,) int
  body_weldid: np.ndarray    # (nbody,) int
  body_jntadr: np.ndarray    # (nbody,) int
  body_jntnum: np.ndarray    # (nbody,) int
  body_dofadr: np.ndarray    # (nbody,) int
  body_dofnum: np.ndarray    # (nbody,) int
  body_geomadr: np.ndarray   # (nbody,) int
  body_geomnum: np.ndarray   # (nbody,) int
  body_pos: np.ndarray       # (nbody, 3)
  body_quat: np.ndarray      # (nbody, 4)
  body_ipos: np.ndarray      # (nbody, 3)
  body_iquat: np.ndarray     # (nbody, 4)
  body_mass: np.ndarray      # (nbody,)
  body_subtreemass: np.ndarray  # (nbody,)
  body_inertia: np.ndarray   # (nbody, 3)
  body_invweight0: np.ndarray  # (nbody, 2)

  # ---- joints
  jnt_type: np.ndarray       # (njnt,) int
  jnt_qposadr: np.ndarray    # (njnt,) int
  jnt_dofadr: np.ndarray     # (njnt,) int
  jnt_bodyid: np.ndarray     # (njnt,) int
  jnt_limited: np.ndarray    # (njnt,) bool
  jnt_solref: np.ndarray     # (njnt, 2)
  jnt_solimp: np.ndarray     # (njnt, 5)
  jnt_pos: np.ndarray        # (njnt, 3)
  jnt_axis: np.ndarray       # (njnt, 3)
  jnt_stiffness: np.ndarray  # (njnt,)
  jnt_range: np.ndarray      # (njnt, 2)
  jnt_margin: np.ndarray     # (njnt,)

  # ---- dofs
  dof_bodyid: np.ndarray     # (nv,) int
  dof_jntid: np.ndarray      # (nv,) int
  dof_parentid: np.ndarray   # (nv,) int  (-1 = none)
  dof_armature: np.ndarray   # (nv,)
  dof_damping: np.ndarray    # (nv,)
  dof_invweight0: np.ndarray  # (nv,)
  dof_frictionloss: np.ndarray  # (nv,)

  # ---- geoms
  geom_type: np.ndarray      # (ngeom,) int
  geom_bodyid: np.ndarray    # (ngeom,) int
  geom_contype: np.ndarray   # (ngeom,) int
  geom_conaffinity: np.ndarray  # (ngeom,) int
  geom_condim: np.ndarray    # (ngeom,) int
  geom_priority: np.ndarray  # (ngeom,) int
  geom_solmix: np.ndarray    # (ngeom,)
  geom_solref: np.ndarray    # (ngeom, 2)
  geom_solimp: np.ndarray    # (ngeom, 5)
  geom_size: np.ndarray      # (ngeom, 3)
  geom_pos: np.ndarray       # (ngeom, 3)
  geom_quat: np.ndarray      # (ngeom, 4)
  geom_friction: np.ndarray  # (ngeom, 3)
  geom_margin: np.ndarray    # (ngeom,)
  geom_gap: np.ndarray       # (ngeom,)

  # ---- sites
  site_bodyid: np.ndarray    # (nsite,) int
  site_pos: np.ndarray       # (nsite, 3)
  site_quat: np.ndarray      # (nsite, 4)
  site_size: np.ndarray      # (nsite, 3)
  site_type: np.ndarray      # (nsite,) int

  # ---- tendons (fixed/joint tendons only: rodent_cpu.xml:505-560)
  tendon_adr: np.ndarray     # (ntendon,) int  index into wrap arrays
  tendon_num: np.ndarray     # (ntendon,) int
  tendon_limited: np.ndarray  # (ntendon,) bool
  tendon_range: np.ndarray   # (ntendon, 2)
  tendon_solref_lim: np.ndarray  # (ntendon, 2)
  tendon_solimp_lim: np.ndarray  # (ntendon, 5)
  tendon_stiffness: np.ndarray  # (ntendon,)
  tendon_damping: np.ndarray  # (ntendon,)
  tendon_lengthspring: np.ndarray  # (ntendon, 2)
  tendon_length0: np.ndarray  # (ntendon,)
  tendon_invweight0: np.ndarray  # (ntendon,)
  wrap_jntid: np.ndarray     # (nwrap,) int  joint id of each wrap entry
  wrap_coef: np.ndarray      # (nwrap,)

  # ---- actuators
  actuator_trntype: np.ndarray   # (nu,) int
  actuator_dyntype: np.ndarray   # (nu,) int
  actuator_gaintype: np.ndarray  # (nu,) int
  actuator_biastype: np.ndarray  # (nu,) int
  actuator_trnid: np.ndarray     # (nu, 2) int
  actuator_actadr: np.ndarray    # (nu,) int (-1 = stateless)
  actuator_actnum: np.ndarray    # (nu,) int
  actuator_ctrllimited: np.ndarray  # (nu,) bool
  actuator_forcelimited: np.ndarray  # (nu,) bool
  actuator_dynprm: np.ndarray    # (nu, 10)
  actuator_gainprm: np.ndarray   # (nu, 10)
  actuator_biasprm: np.ndarray   # (nu, 10)
  actuator_ctrlrange: np.ndarray  # (nu, 2)
  actuator_forcerange: np.ndarray  # (nu, 2)
  actuator_gear: np.ndarray      # (nu, 6)
  actuator_acc0: np.ndarray      # (nu,)

  # ---- sensors
  sensor_type: np.ndarray    # (nsensor,) int
  sensor_objid: np.ndarray   # (nsensor,) int
  sensor_adr: np.ndarray     # (nsensor,) int
  sensor_dim: np.ndarray     # (nsensor,) int

  # ---- keyframes
  key_qpos: np.ndarray       # (nkey, nq)

  # ---- compiled collision table (static)
  contact_slots: Tuple[ContactSlot, ...] = ()

  # ---- names (debug / lookup)
  body_names: Tuple[str, ...] = ()
  joint_names: Tuple[str, ...] = ()
  geom_names: Tuple[str, ...] = ()
  site_names: Tuple[str, ...] = ()
  actuator_names: Tuple[str, ...] = ()
  sensor_names: Tuple[str, ...] = ()
  camera_names: Tuple[str, ...] = ()
  key_names: Tuple[str, ...] = ()

  # ------------------------------------------------------------------
  @property
  def ncon_max(self) -> int:
    return sum(s.max_points for s in self.contact_slots)

  @property
  def nlimit(self) -> int:
    """Number of potential limit rows: 2 per limited hinge/slide joint,
    2 per limited tendon."""
    njl = int(sum(2 for j in range(self.njnt)
                  if self.jnt_limited[j]
                  and self.jnt_type[j] in (JointType.HINGE, JointType.SLIDE)))
    ntl = int(sum(2 for t in range(self.ntendon) if self.tendon_limited[t]))
    return njl + ntl

  @property
  def nefc_max(self) -> int:
    ncon_rows = 0
    for s in self.contact_slots:
      rows = 1 if s.condim == 1 else 2 * (s.condim - 1)
      ncon_rows += rows * s.max_points
    return self.nlimit + ncon_rows

  def replace(self, **kwargs) -> "Model":
    return dataclasses.replace(self, **kwargs)

  def name2id(self, kind: str, name: str) -> int:
    names = getattr(self, f"{kind}_names")
    return names.index(name)


@struct.dataclass
class Contact:
  """Fixed-size batched contact set (shape leading dims may be batched)."""
  dist: jax.Array        # (ncon,)
  pos: jax.Array         # (ncon, 3)
  frame: jax.Array       # (ncon, 3, 3) rows: normal, tangent1, tangent2

@struct.dataclass
class Data:
  """Dynamic simulation state + forward-pass products (pure pytree)."""

  # state
  qpos: jax.Array          # (nq,)
  qvel: jax.Array          # (nv,)
  act: jax.Array           # (na,)
  ctrl: jax.Array          # (nu,)
  time: jax.Array          # ()

  # kinematics
  xpos: jax.Array          # (nbody, 3)
  xquat: jax.Array         # (nbody, 4)
  xmat: jax.Array          # (nbody, 3, 3)
  xipos: jax.Array         # (nbody, 3)
  ximat: jax.Array         # (nbody, 3, 3)
  xanchor: jax.Array       # (njnt, 3)
  xaxis: jax.Array         # (njnt, 3)
  geom_xpos: jax.Array     # (ngeom, 3)
  geom_xmat: jax.Array     # (ngeom, 3, 3)
  site_xpos: jax.Array     # (nsite, 3)
  site_xmat: jax.Array     # (nsite, 3, 3)

  # com-based quantities
  subtree_com: jax.Array   # (nbody, 3)
  cinert: jax.Array        # (nbody, 10)
  cdof: jax.Array          # (nv, 6)

  # tendons
  ten_length: jax.Array    # (ntendon,)
  ten_velocity: jax.Array  # (ntendon,)
  ten_J: jax.Array         # (ntendon, nv)

  # mass matrix
  qM: jax.Array            # (nv, nv) dense (jacobian=0, Rodent_Env_Brax.py:49)
  qMinv: jax.Array         # (nv, nv) explicit inverse (factor_m)

  # velocity products
  cvel: jax.Array          # (nbody, 6)
  cdof_dot: jax.Array      # (nv, 6)

  # forces
  qfrc_bias: jax.Array       # (nv,)
  qfrc_passive: jax.Array    # (nv,)
  qfrc_spring: jax.Array     # (nv,)
  qfrc_damper: jax.Array     # (nv,)
  actuator_length: jax.Array   # (nu,)
  actuator_velocity: jax.Array  # (nu,)
  actuator_moment: jax.Array  # (nu, nv)
  actuator_force: jax.Array  # (nu,)
  act_dot: jax.Array         # (na,)
  qfrc_actuator: jax.Array   # (nv,)
  qfrc_applied: jax.Array    # (nv,)
  qfrc_smooth: jax.Array     # (nv,)
  qacc_smooth: jax.Array     # (nv,)

  # contacts (fixed-size, masked by dist < includemargin)
  contact: Contact

  # constraint rows (fixed-size). The Jacobian is stored STRUCTURED, not
  # dense: joint-limit rows are static +-1 columns (compile-time), tendon
  # rows reuse ten_J, and each contact point stores 3 base rows
  # [normal, tangent1, tangent2] from which the pyramid rows
  # n +- mu*t are derived on the fly (constraint.efc_matvec /
  # efc_rmatvec). This halves the HBM traffic of the CG solve, the
  # hottest part of the substep.
  con_Jbase: jax.Array     # (ncon, 3, nv)
  efc_D: jax.Array         # (nefc,)
  efc_aref: jax.Array      # (nefc,)
  efc_pos: jax.Array       # (nefc,)
  efc_margin: jax.Array    # (nefc,)
  efc_active: jax.Array    # (nefc,) bool: row exists this step
  efc_force: jax.Array     # (nefc,)
  qfrc_constraint: jax.Array  # (nv,)

  # result
  qacc: jax.Array          # (nv,)
  sensordata: jax.Array    # (nsensordata,)

  # solver diagnostics
  solver_niter: jax.Array  # () int


def make_data(m: Model, dtype=None) -> Data:
  """Allocate an all-zero Data at qpos0 (kinematics NOT yet computed)."""
  import jax.numpy as jnp
  dtype = dtype or jnp.float32
  z = lambda *s: jnp.zeros(s, dtype)
  nefc = m.nefc_max
  ncon = m.ncon_max
  ident = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.nbody, 3, 3))
  qpos0 = jnp.asarray(m.qpos0, dtype)
  xquat0 = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (m.nbody, 1))
  return Data(
      qpos=qpos0, qvel=z(m.nv), act=z(m.na), ctrl=z(m.nu),
      time=jnp.zeros((), dtype),
      xpos=z(m.nbody, 3), xquat=xquat0, xmat=ident,
      xipos=z(m.nbody, 3), ximat=ident,
      xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.ngeom, 3, 3)),
      site_xpos=z(m.nsite, 3),
      site_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.nsite, 3, 3)),
      subtree_com=z(m.nbody, 3), cinert=z(m.nbody, 10), cdof=z(m.nv, 6),
      ten_length=z(m.ntendon), ten_velocity=z(m.ntendon),
      ten_J=z(m.ntendon, m.nv),
      qM=z(m.nv, m.nv), qMinv=z(m.nv, m.nv),
      cvel=z(m.nbody, 6), cdof_dot=z(m.nv, 6),
      qfrc_bias=z(m.nv), qfrc_passive=z(m.nv),
      qfrc_spring=z(m.nv), qfrc_damper=z(m.nv),
      actuator_length=z(m.nu), actuator_velocity=z(m.nu),
      actuator_moment=z(m.nu, m.nv),
      actuator_force=z(m.nu), act_dot=z(m.na),
      qfrc_actuator=z(m.nv), qfrc_applied=z(m.nv),
      qfrc_smooth=z(m.nv), qacc_smooth=z(m.nv),
      contact=Contact(dist=jnp.full((ncon,), 1e10, dtype),
                      pos=z(ncon, 3),
                      frame=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                             (ncon, 3, 3))),
      con_Jbase=z(ncon, 3, m.nv), efc_D=z(nefc), efc_aref=z(nefc),
      efc_pos=z(nefc), efc_margin=z(nefc),
      efc_active=jnp.zeros((nefc,), bool), efc_force=z(nefc),
      qfrc_constraint=z(m.nv),
      qacc=z(m.nv), sensordata=z(m.nsensordata),
      solver_niter=jnp.zeros((), jnp.int32),
  )
