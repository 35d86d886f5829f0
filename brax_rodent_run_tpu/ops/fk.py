"""In-kernel forward kinematics emitter (v3 building block).

``emit_kinematics`` generates the body of mj_kinematics for a Pallas TPU
kernel: level-by-level batched frame propagation on (rows, E) component
slices, mirroring physics/smooth.kinematics exactly (same per-body
formula order; the levels come from tree.masks). It is written as an
emitter so the same code can run inside the full-substep kernel
(ops/fused_full.py) and inside a standalone test kernel.

Conventions: every quantity is a list of (rows, E) component slices
(e.g. xpos = [x, y, z] each (nbody, E)); static tables are passed as
VMEM const refs through the ``C`` dict (Pallas cannot embed array
constants). All row gathers/scatters are one-hot MXU matmuls with
compile-time tables.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import JointType, Model

_MXU = lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST)  # true-f32: see fused_full.mxu


@dataclasses.dataclass(frozen=True)
class FKStatics:
  """Packed per-level constant tables (all float32 numpy)."""
  # per level: gather parent bodies (L, nbody), scatter level bodies
  # (nbody, L); rows packed along axis 0/1 with offsets
  GPAR: np.ndarray        # (sumL, nbody)
  SLVL: np.ndarray        # (nbody, sumL)
  BODYTAB: np.ndarray     # (sumL, 16): body_pos(3) body_quat(4)
  # per joint slot (level-packed): same row layout as the level it's in
  JTAB: list              # per (level, k): (L, 16) np arrays
  offsets: tuple          # row offset per level
  sizes: tuple            # L per level
  kmax: tuple             # joint slots per level
  jscatter: list          # per (level, k): (njnt_pad, L) scatter one-hot
  # free joints: slots (level,k) that contain >=1 free joint get a
  # (7L, nq) one-hot gather QFSEL (3L pos-comp rows then 4L quat-comp
  # rows); rows of non-free joints are zero and masked by is_f
  free_slots: tuple       # slot indices ji with free joints
  nbody: int
  njnt_pad: int


def _jtab_rows(m: Model, ids, k):
  """Per-level joint-slot table rows: [has, is_h, is_s, is_f, qadr?,
  ax(3), jpos(3), qpos0sel] — numeric params only; qpos gathers use
  one-hot matmuls from QSEL tables."""
  jnum = np.asarray(m.body_jntnum)[ids]
  jadr = np.asarray(m.body_jntadr)[ids]
  has = jnum > k
  j = np.where(has, jadr + k, 0)
  jt = np.asarray(m.jnt_type)[j]
  tab = np.zeros((len(ids), 16), np.float32)
  tab[:, 0] = has
  tab[:, 1] = has & (jt == JointType.HINGE)
  tab[:, 2] = has & (jt == JointType.SLIDE)
  tab[:, 3] = has & (jt == JointType.FREE)
  tab[:, 4:7] = np.asarray(m.jnt_axis)[j]
  tab[:, 7:10] = np.asarray(m.jnt_pos)[j]
  tab[:, 10] = np.asarray(m.qpos0)[np.asarray(m.jnt_qposadr)[j]]
  return tab, j, has


@functools.lru_cache(maxsize=16)
def fk_statics(m: Model):
  mk = masks(m)
  nbody, njnt = m.nbody, m.njnt
  njnt_pad = max(njnt, 1)
  levels = mk.levels
  sizes = tuple(len(ids) for ids in levels)
  offs, o = [], 0
  for L in sizes:
    offs.append(o)
    o += L
  sumL = o

  GPAR = np.zeros((sumL, nbody), np.float32)
  SLVL = np.zeros((nbody, sumL), np.float32)
  BODYTAB = np.zeros((sumL, 16), np.float32)
  kmax = []
  JTAB, JSC = [], []
  QSEL = []                      # per (level,k): (L, nq) one-hot qpos row
  QFSEL = {}                     # per slot ji with free joints: (7L, nq)
  free_slots = []
  ji = 0
  for li, ids in enumerate(levels):
    par = np.asarray(m.body_parentid)[ids]
    r = offs[li]
    GPAR[r + np.arange(len(ids)), par] = 1.0
    SLVL[np.asarray(ids), r + np.arange(len(ids))] = 1.0
    BODYTAB[r:r + len(ids), 0:3] = np.asarray(m.body_pos)[ids]
    BODYTAB[r:r + len(ids), 3:7] = np.asarray(m.body_quat)[ids]
    km = int(np.asarray(m.body_jntnum)[ids].max()) if len(ids) else 0
    kmax.append(km)
    for k in range(km):
      tab, j, has = _jtab_rows(m, ids, k)
      JTAB.append(tab)
      sc = np.zeros((njnt_pad, len(ids)), np.float32)
      for row, (jj, h) in enumerate(zip(j, has)):
        if h:
          sc[jj, row] = 1.0
      JSC.append(sc)
      qs = np.zeros((len(ids), m.nq), np.float32)
      qadr = np.asarray(m.jnt_qposadr)[j]
      for row, (qa, h) in enumerate(zip(qadr, has)):
        if h:
          qs[row, qa] = 1.0
      QSEL.append(qs)
      L = len(ids)
      fs = np.zeros((7 * L, m.nq), np.float32)
      any_free = False
      for row, (jj, h) in enumerate(zip(j, has)):
        if h and int(np.asarray(m.jnt_type)[jj]) == JointType.FREE:
          any_free = True
          fq = int(np.asarray(m.jnt_qposadr)[jj])
          for c in range(3):
            fs[c * L + row, fq + c] = 1.0
          for c in range(4):
            fs[(3 + c) * L + row, fq + 3 + c] = 1.0
      if any_free:
        QFSEL[ji] = fs
        free_slots.append(ji)
      ji += 1
  return FKStatics(GPAR=GPAR, SLVL=SLVL, BODYTAB=BODYTAB, JTAB=JTAB,
                   offsets=tuple(offs), sizes=sizes, kmax=tuple(kmax),
                   jscatter=JSC, free_slots=tuple(free_slots),
                   nbody=nbody, njnt_pad=njnt_pad), (QSEL, QFSEL)


def fk_consts(m: Model):
  """Const dict to merge into a kernel's VMEM inputs (K_ prefix)."""
  st, (QSEL, QFSEL) = fk_statics(m)
  c = {"K_GPAR": st.GPAR, "K_SLVL": st.SLVL, "K_BODYTAB": st.BODYTAB}
  for i, (t, sc, qs) in enumerate(zip(st.JTAB, st.jscatter, QSEL)):
    c[f"K_JTAB{i}"] = t
    c[f"K_JSC{i}"] = sc
    c[f"K_QSEL{i}"] = qs
  for i, fs in QFSEL.items():
    c[f"K_QFSEL{i}"] = fs
  return c


def _qmul(a, b):
  """component-list Hamilton product."""
  w1, x1, y1, z1 = a
  w2, x2, y2, z2 = b
  return [w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2]


def _qrot(q, v):
  """rotate component-list vector v by quaternion q (math.quat_rot)."""
  w, rx, ry, rz = q
  tx = 2.0 * (ry * v[2] - rz * v[1])
  ty = 2.0 * (rz * v[0] - rx * v[2])
  tz = 2.0 * (rx * v[1] - ry * v[0])
  return [v[0] + w * tx + ry * tz - rz * ty,
          v[1] + w * ty + rz * tx - rx * tz,
          v[2] + w * tz + rx * ty - ry * tx]


def emit_kinematics(m: Model, C, qpos):
  """Emit FK ops; returns (xpos, xquat, xanchor, xaxis) component lists:
  xpos/xquat as (nbody, E) slices, xanchor/xaxis as (njnt_pad, E)."""
  st, _ = fk_statics(m)
  E = qpos.shape[-1]
  f32 = jnp.float32
  nb = st.nbody

  zero_b = jnp.zeros((nb, E), f32)
  # w=1 ONLY at the world row: level scatters ADD into these arrays,
  # so initializing w=1 everywhere would double-count written rows
  w0 = (jax.lax.broadcasted_iota(jnp.int32, (nb, E), 0) == 0)
  xpos = [zero_b, zero_b, zero_b]
  xquat = [w0.astype(f32), zero_b, zero_b, zero_b]
  xanchor = [jnp.zeros((st.njnt_pad, E), f32) for _ in range(3)]
  xaxis = [jnp.zeros((st.njnt_pad, E), f32) for _ in range(3)]

  ji = 0
  for li, L in enumerate(st.sizes):
    r = st.offsets[li]
    G = C["K_GPAR"][r:r + L]                       # (L, nbody)
    BT = C["K_BODYTAB"][r:r + L]
    ppos = [_MXU(G, xpos[c]) for c in range(3)]
    pquat = [_MXU(G, xquat[c]) for c in range(4)]
    bpos = [BT[:, c:c + 1] for c in range(3)]
    bquat = [BT[:, 3 + c:4 + c] for c in range(4)]
    rot = _qrot(pquat, bpos)
    pos = [ppos[c] + rot[c] for c in range(3)]
    quat = _qmul(pquat, bquat)

    for k in range(st.kmax[li]):
      JT = C[f"K_JTAB{ji}"][:]
      qv = _MXU(C[f"K_QSEL{ji}"][:], qpos)         # (L, E)
      is_h = JT[:, 1:2]
      is_s = JT[:, 2:3]
      is_f = JT[:, 3:4]
      ax0 = [JT[:, 4 + c:5 + c] for c in range(3)]
      jp = [JT[:, 7 + c:8 + c] for c in range(3)]
      q0 = JT[:, 10:11]

      jrot = _qrot(quat, jp)
      anchor_h = [pos[c] + jrot[c] for c in range(3)]
      axis_w = _qrot(quat, ax0)
      half = 0.5 * (qv - q0)
      ch, sh = jnp.cos(half), jnp.sin(half)
      qloc = [ch, ax0[0] * sh, ax0[1] * sh, ax0[2] * sh]
      quat_h = _qmul(quat, qloc)
      pos_h = [anchor_h[c] - x for c, x in enumerate(_qrot(quat_h, jp))]
      pos_s = [pos[c] + axis_w[c] * (qv - q0) for c in range(3)]
      sr = _qrot(quat, jp)
      anchor_s = [pos_s[c] + sr[c] for c in range(3)]

      if ji in st.free_slots:
        # per-row free-joint qpos gather (rows of non-free joints are
        # zero and masked out by is_f below)
        sel = _MXU(C[f"K_QFSEL{ji}"][:], qpos)       # (7L, E)
        pos_f = [sel[c * L:(c + 1) * L] for c in range(3)]
        qf = [sel[(3 + c) * L:(4 + c) * L] for c in range(4)]
        qn = jnp.sqrt(qf[0] * qf[0] + qf[1] * qf[1] + qf[2] * qf[2]
                      + qf[3] * qf[3])
        quat_f = [qf[c] / jnp.maximum(qn, 1e-15) for c in range(4)]
      else:
        pos_f, quat_f = pos, quat

      pos = [is_h * pos_h[c] + is_s * pos_s[c] + is_f * pos_f[c]
             + (1.0 - is_h - is_s - is_f) * pos[c] for c in range(3)]
      quat = [is_h * quat_h[c] + is_f * quat_f[c]
              + (1.0 - is_h - is_f) * quat[c] for c in range(4)]

      anchor = [is_h * anchor_h[c] + is_s * anchor_s[c] + is_f * pos_f[c]
                for c in range(3)]
      axis = [(is_h + is_s) * axis_w[c] + is_f * ax0[c] for c in range(3)]
      SC = C[f"K_JSC{ji}"][:]
      for c in range(3):
        xanchor[c] = xanchor[c] + _MXU(SC, anchor[c])
        xaxis[c] = xaxis[c] + _MXU(SC, axis[c])
      ji += 1

    S = C["K_SLVL"][:, r:r + L]                    # (nbody, L)
    for c in range(3):
      xpos[c] = xpos[c] + _MXU(S, pos[c])
    for c in range(4):
      xquat[c] = xquat[c] + _MXU(S, quat[c])
  # world row of xquat started at w=1 and level scatters add disjoint
  # rows, so xquat rows are exact (world w stays 1)

  return xpos, xquat, xanchor, xaxis


def quat_to_mat9(q):
  """component-list quaternion -> 9 rotation-matrix component slices
  (row-major m[a][b]), matching math.quat_to_mat."""
  w, x, y, z = q
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
          2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
          2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)]


@functools.lru_cache(maxsize=8)
def fk_test_kernel(m: Model, interpret: bool = True):
  """Standalone pallas_call wrapping emit_kinematics (testing only)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  consts = fk_consts(m)
  cnames = list(consts.keys())
  cvals = [consts[k] for k in cnames]
  st, _ = fk_statics(m)
  nb, njp = st.nbody, st.njnt_pad
  out_rows = [3 * nb, 4 * nb, 3 * njp, 3 * njp]

  def kernel(*refs):
    C = {k: r for k, r in zip(cnames, refs[:len(cnames)])}
    qpos_ref = refs[len(cnames)]
    outs = refs[len(cnames) + 1:]
    xpos, xquat, xanchor, xaxis = emit_kinematics(m, C, qpos_ref[:])
    outs[0][:] = jnp.concatenate(xpos, axis=0)
    outs[1][:] = jnp.concatenate(xquat, axis=0)
    outs[2][:] = jnp.concatenate(xanchor, axis=0)
    outs[3][:] = jnp.concatenate(xaxis, axis=0)

  E = 128

  def call(qpos):                                 # (nq, B)
    B = qpos.shape[-1]
    spec = lambda rows: pl.BlockSpec((rows, E), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    cspec = lambda sh: pl.BlockSpec(sh, lambda i: (0,) * len(sh),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((r, B), jnp.float32)
                        for r in out_rows),
        grid=(B // E,),
        in_specs=[cspec(c.shape) for c in cvals] + [spec(m.nq)],
        out_specs=tuple(spec(r) for r in out_rows),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*cvals, qpos)

  return call
