"""In-kernel collision narrow-phase emitter (v3 building block).

Supports the plane-vs-{sphere, capsule, ellipsoid} slot families that
cover the reference's MJX-facing models (rodent_new/rodent_optimized/
rodent_0: plane-capsule + plane-ellipsoid; humanoid: plane-capsule +
plane-sphere). Mirrors physics/collision.py formulas exactly, including
make_frame's least-aligned-axis default tangent and the capsule-axis
tangent hint (mjc_PlaneCapsule semantics).

Same conventions as ops/fk.py: component-slice (rows, E) arrays, static
tables as VMEM const refs via the ``C`` dict, gathers/scatters as
one-hot MXU matmuls.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.types import GeomType, Model

_MXU = lambda a, b: jax.lax.dot_general(
    a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST)  # true-f32: see fused_full.mxu

_SUPPORTED = {
    (int(GeomType.PLANE), int(GeomType.SPHERE)),
    (int(GeomType.PLANE), int(GeomType.CAPSULE)),
    (int(GeomType.PLANE), int(GeomType.ELLIPSOID)),
}


def collision_supported(m: Model) -> bool:
  return all((s.type1, s.type2) in _SUPPORTED for s in m.contact_slots)


@dataclasses.dataclass(frozen=True)
class CollStatics:
  used: np.ndarray          # (nG,) geom ids appearing in slots
  GEOB: np.ndarray          # (nG, nbody) one-hot geom body
  GTAB: np.ndarray          # (nG, 16): gpos(3) gquat(4) size(3)
  groups: tuple             # ((t1,t2), g1rows(Sg,), g2rows(Sg,), con_ids)
  nG: int


@functools.lru_cache(maxsize=16)
def coll_statics(m: Model) -> CollStatics:
  used = sorted({s.geom1 for s in m.contact_slots}
                | {s.geom2 for s in m.contact_slots})
  used = np.asarray(used, np.int64)
  gidx = {g: i for i, g in enumerate(used)}
  nG = len(used)
  GEOB = np.zeros((nG, m.nbody), np.float32)
  GEOB[np.arange(nG), np.asarray(m.geom_bodyid)[used]] = 1.0
  GTAB = np.zeros((nG, 16), np.float32)
  GTAB[:, 0:3] = np.asarray(m.geom_pos)[used]
  GTAB[:, 3:7] = np.asarray(m.geom_quat)[used]
  GTAB[:, 7:10] = np.asarray(m.geom_size)[used]

  # group slots by type pair, tracking contact-slot offsets
  offsets, off = [], 0
  for s in m.contact_slots:
    offsets.append(off)
    off += s.max_points
  byg = {}
  for k, s in enumerate(m.contact_slots):
    byg.setdefault((s.type1, s.type2), []).append(k)
  groups = []
  for (t1, t2), idxs in sorted(byg.items()):
    g1 = np.asarray([gidx[m.contact_slots[k].geom1] for k in idxs])
    g2 = np.asarray([gidx[m.contact_slots[k].geom2] for k in idxs])
    P = m.contact_slots[idxs[0]].max_points
    cids = np.asarray([offsets[k] for k in idxs])
    groups.append(((t1, t2), g1, g2, cids, P))
  return CollStatics(used=used, GEOB=GEOB, GTAB=GTAB,
                     groups=tuple(groups), nG=nG)


def coll_consts(m: Model):
  st = coll_statics(m)
  c = {"C_GEOB": st.GEOB, "C_GTAB": st.GTAB}
  ncon = m.ncon_max
  nc3 = 3 * ncon
  for gi, ((t1, t2), g1, g2, cids, P) in enumerate(st.groups):
    S = len(g1)
    G1 = np.zeros((S, st.nG), np.float32)
    G1[np.arange(S), g1] = 1.0
    G2 = np.zeros((S, st.nG), np.float32)
    G2[np.arange(S), g2] = 1.0
    c[f"C_G1_{gi}"] = G1
    c[f"C_G2_{gi}"] = G2
    # scatter: point p of slot row s -> contact cids[s]+p; frame row
    # (c, d) -> packed row 3c+d
    SC = np.zeros((ncon, S * P), np.float32)
    SF = [np.zeros((nc3, S * P), np.float32) for _ in range(3)]
    for srow in range(S):
      for p in range(P):
        cid = cids[srow] + p
        SC[cid, srow * P + p] = 1.0
        for d in range(3):
          SF[d][3 * cid + d, srow * P + p] = 1.0
    c[f"C_SC_{gi}"] = SC
    for d in range(3):
      c[f"C_SF{d}_{gi}"] = SF[d]
  c["C_EYEF"] = eyef_const(m)
  return c


def _dot3(a, b):
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
  return [a[1] * b[2] - a[2] * b[1],
          a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]]


def _make_frame(n, hint):
  """collision.make_frame on component slices; hint may be None."""
  nn = jnp.sqrt(jnp.maximum(_dot3(n, n), 1e-30))
  n = [n[c] / jnp.maximum(nn, 1e-15) for c in range(3)]
  an = [jnp.abs(n[c]) for c in range(3)]
  is_x = ((an[0] < an[1]) & (an[0] < an[2])).astype(jnp.float32)
  is_y = (1.0 - is_x) * (an[1] < an[2]).astype(jnp.float32)
  is_z = 1.0 - is_x - is_y
  tmp = [is_x, is_y, is_z]
  ndt = _dot3(n, tmp)
  t1 = [tmp[c] - n[c] * ndt for c in range(3)]
  if hint is not None:
    ndh = _dot3(n, hint)
    hp = [hint[c] - n[c] * ndh for c in range(3)]
    hn = jnp.sqrt(jnp.maximum(_dot3(hp, hp), 1e-30))
    use = (hn > 1e-8).astype(jnp.float32)
    t1 = [use * hp[c] + (1.0 - use) * t1[c] for c in range(3)]
  t1n = jnp.sqrt(jnp.maximum(_dot3(t1, t1), 1e-30))
  t1 = [t1[c] / jnp.maximum(t1n, 1e-15) for c in range(3)]
  t2 = _cross3(n, t1)
  return n, t1, t2


def emit_collision(m: Model, C, xpos, xquat):
  """Emit narrow-phase; returns (cdist (ncon, E), cpos 3 comps of
  (ncon, E), frame 3 comps of (nc3, E) in (c,d)-row-major layout —
  exactly the fused kernel's contact input format)."""
  from brax_rodent_run_tpu.ops.fk import _qmul, _qrot, quat_to_mat9

  st = coll_statics(m)
  ncon = m.ncon_max
  E = xpos[0].shape[-1]
  f32 = jnp.float32
  GT = C["C_GTAB"][:]
  GEOB = C["C_GEOB"][:]

  # world geom frames for the used geoms
  bpos = [_MXU(GEOB, xpos[c]) for c in range(3)]
  bquat = [_MXU(GEOB, xquat[c]) for c in range(4)]
  gp = [GT[:, c:c + 1] for c in range(3)]
  gq = [GT[:, 3 + c:4 + c] for c in range(4)]
  rot = _qrot(bquat, gp)
  gxpos = [bpos[c] + rot[c] for c in range(3)]
  gxquat = _qmul(bquat, gq)
  gxmat = quat_to_mat9(gxquat)              # m[a][b] at index 3a+b
  gsize = [GT[:, 7 + c:8 + c] for c in range(3)]

  cdist = jnp.zeros((ncon, E), f32) + 1e10
  cpos = [jnp.zeros((ncon, E), f32) for _ in range(3)]
  # identity frame default handled by scatter-add over a zero base plus
  # the static identity complement (rows never written keep eye)
  frame = [jnp.zeros((3 * ncon, E), f32) for _ in range(3)]

  written = np.zeros(ncon, bool)
  for gi, ((t1, t2), g1r, g2r, cids, P) in enumerate(st.groups):
    G1 = C[f"C_G1_{gi}"][:]
    G2 = C[f"C_G2_{gi}"][:]
    p1 = [_MXU(G1, gxpos[c]) for c in range(3)]
    m1 = [_MXU(G1, gxmat[i]) for i in range(9)]
    p2 = [_MXU(G2, gxpos[c]) for c in range(3)]
    s2 = [_MXU(G2, gsize[c]) for c in range(3)]
    n = [m1[3 * a + 2] for a in range(3)]       # plane z column
    if t2 == int(GeomType.SPHERE):
      r = s2[0]
      dvec = [p2[c] - p1[c] for c in range(3)]
      cdst = _dot3(n, dvec)
      dist = cdst - r
      pos = [p2[c] - n[c] * (r + 0.5 * dist) for c in range(3)]
      pts = [(dist, pos, _make_frame(n, None))]
    elif t2 == int(GeomType.CAPSULE):
      m2 = [_MXU(G2, gxmat[i]) for i in range(9)]
      axis = [m2[3 * a + 2] for a in range(3)]
      r, hl = s2[0], s2[1]
      pts = []
      for sgn in (1.0, -1.0):
        end = [p2[c] + sgn * axis[c] * hl for c in range(3)]
        cdst = _dot3(n, [end[c] - p1[c] for c in range(3)])
        dist = cdst - r
        pos = [end[c] - n[c] * (r + 0.5 * dist) for c in range(3)]
        pts.append((dist, pos, _make_frame(n, axis)))
    elif t2 == int(GeomType.ELLIPSOID):
      m2 = [_MXU(G2, gxmat[i]) for i in range(9)]
      # normal in ellipsoid frame: nl_a = sum_c m2[c][a] n_c
      nl = [sum(m2[3 * c + a] * n[c] for c in range(3)) for a in range(3)]
      den = jnp.sqrt(jnp.maximum(
          sum((s2[a] * nl[a]) ** 2 for a in range(3)), 1e-24))
      sup = [-(s2[a] * s2[a] * nl[a]) / jnp.maximum(den, 1e-12)
             for a in range(3)]
      point = [p2[c] + sum(m2[3 * c + a] * sup[a] for a in range(3))
               for c in range(3)]
      dist = _dot3(n, [point[c] - p1[c] for c in range(3)])
      pos = [point[c] - 0.5 * dist * n[c] for c in range(3)]
      pts = [(dist, pos, _make_frame(n, None))]
    else:
      raise NotImplementedError((t1, t2))

    # interleave points into (S*P) rows: row s*P + p
    S = len(g1r)
    def ileave(vals):
      # vals: list of P arrays (S, E) -> (S*P, E) row-major by point
      if P == 1:
        return vals[0]
      stacked = jnp.stack(vals, axis=1)        # (S, P, E)
      return stacked.reshape(S * P, E)

    dist_rows = ileave([pt[0] for pt in pts])
    SCg = C[f"C_SC_{gi}"][:]
    cdist = cdist - _MXU(SCg, jnp.full((S * P, E), 1e10, f32)) \
        + _MXU(SCg, dist_rows)
    for c in range(3):
      cpos[c] = cpos[c] + _MXU(SCg, ileave([pt[1][c] for pt in pts]))
    for d in range(3):
      SFd = C[f"C_SF{d}_{gi}"][:]
      frow = [pt[2][d] for pt in pts]          # P frames, each 3 comps
      for comp in range(3):
        frame[comp] = frame[comp] + _MXU(
            SFd, ileave([fr[comp] for fr in frow]))
    for srow in range(S):
      for p in range(P):
        written[cids[srow] + p] = True

  # unwritten contact rows keep the identity frame (collision() default);
  # C_EYEF is all-zero when every slot is written
  ef = C["C_EYEF"][:]
  for comp in range(3):
    frame[comp] = frame[comp] + ef[:, comp:comp + 1]
  return cdist, cpos, frame


def eyef_const(m: Model):
  """(nc3, 3) identity-frame filler for contact slots never written
  (none in practice — every slot belongs to a group — but kept for
  safety with partially supported models)."""
  st = coll_statics(m)
  ncon = m.ncon_max
  written = np.zeros(ncon, bool)
  for (tt, g1r, g2r, cids, P) in st.groups:
    for srow in range(len(g1r)):
      for p in range(P):
        written[cids[srow] + p] = True
  ef = np.zeros((3 * ncon, 3), np.float32)
  for cid in np.nonzero(~written)[0]:
    for d in range(3):
      ef[3 * cid + d, d] = 1.0
  return ef


@functools.lru_cache(maxsize=8)
def coll_test_kernel(m: Model, interpret: bool = True):
  """Standalone pallas_call: FK emitter + collision emitter (testing)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from brax_rodent_run_tpu.ops import fk as fk_mod

  consts = {**fk_mod.fk_consts(m), **coll_consts(m)}
  cnames = list(consts.keys())
  cvals = [consts[k] for k in cnames]
  ncon = m.ncon_max
  out_rows = [ncon, 3 * ncon, 9 * ncon]

  def kernel(*refs):
    C = {k: r for k, r in zip(cnames, refs[:len(cnames)])}
    qpos_ref = refs[len(cnames)]
    outs = refs[len(cnames) + 1:]
    xpos, xquat, _, _ = fk_mod.emit_kinematics(m, C, qpos_ref[:])
    cdist, cpos, frame = emit_collision(m, C, xpos, xquat)
    outs[0][:] = cdist
    outs[1][:] = jnp.concatenate(cpos, axis=0)
    outs[2][:] = jnp.concatenate(frame, axis=0)

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
