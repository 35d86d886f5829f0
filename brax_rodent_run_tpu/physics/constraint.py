"""Constraint assembly: joint/tendon limits + pyramidal contact rows.

Produces the fixed-size efc arrays (J, D, aref, pos, margin, active) the
solvers consume. Row layout is compiled statically per Model:

  [2 rows per limited joint (lo, hi)] ++ [2 rows per limited tendon] ++
  [per contact point: 1 row (condim=1) or 2*(condim-1) pyramid rows]

Inactive rows (limit not near, contact not penetrating) get D = 0 and are
masked — shapes never change (TPU static-shape requirement).

Numerical semantics follow MuJoCo's constraint model (solref/solimp
impedance, reference acceleration, diag-approx regularization), which is the
contract the reference's CG-8/8 configuration exercises
(brax_rodent_run_ppo.py:52-53). Formulas verified row-by-row against the
MuJoCo C oracle in tests/test_constraint.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import (
    Data, DisableBit, JointType, Model)

_MINIMP = 0.0001
_MAXIMP = 0.9999
_MINVAL = 1e-15

# Above this (rows x base-cols) entry count, the static pyramid-composition
# matrix C is not materialized; the 2-sparse gather/scatter path is used.
# TPU-facing models (ncon ~ 60) stay comfortably below and keep the
# MXU-friendly mask-matmul form.
_C_DENSE_LIMIT = 2_000_000


@dataclasses.dataclass(frozen=True)
class EfcLayout:
  """Static per-model efc row metadata (host numpy)."""
  nefc: int
  nlimit: int
  # limit rows
  lim_dof: np.ndarray        # (nlimit,) dof index (-1 for tendon rows)
  lim_tendon: np.ndarray     # (nlimit,) tendon index (-1 for joint rows)
  lim_sign: np.ndarray       # (nlimit,) +1 lower / -1 upper
  lim_bound: np.ndarray      # (nlimit,) range value
  lim_solref: np.ndarray     # (nlimit, 2)
  lim_solimp: np.ndarray     # (nlimit, 5)
  lim_margin: np.ndarray     # (nlimit,)
  lim_invweight: np.ndarray  # (nlimit,)
  # contact rows
  ncon_rows: int
  con_id: np.ndarray         # (ncon_rows,) contact slot-point index
  con_dirsign: np.ndarray    # (ncon_rows,) 0 for normal-only, else ±1
  con_diridx: np.ndarray     # (ncon_rows,) tangent index (1 or 2); 0=normal
  con_mu: np.ndarray         # (ncon_rows,) friction coef for this row
  con_solref: np.ndarray     # (ncon_rows, 2)
  con_solimp: np.ndarray     # (ncon_rows, 5)
  con_margin: np.ndarray     # (ncon_rows,) includemargin
  con_invweight: np.ndarray  # (ncon_rows,) diag-approx
  # per contact *point* static data
  con_body1: np.ndarray      # (ncon,) body id of geom1
  con_body2: np.ndarray      # (ncon,)
  con_includemargin: np.ndarray  # (ncon,)


def _warn_single_point_pairs(m: Model) -> None:
  """Box-box / ellipsoid-box narrow-phase uses a single-point MTD descent
  on corner-smoothed supports (physics/collision.py), not MuJoCo's
  multi-point face manifolds — adequate for incidental pairs (the rodent
  head geoms) but under-constrained for face-resting stacks (ADVICE r2).
  Warn once per model class so such models don't ship silently."""
  import warnings
  from brax_rodent_run_tpu.physics.types import GeomType
  single_pt = {(GeomType.BOX, GeomType.BOX),
               (GeomType.ELLIPSOID, GeomType.BOX),
               (GeomType.BOX, GeomType.ELLIPSOID)}
  hits = [
      s for s in m.contact_slots
      if (GeomType(int(m.geom_type[s.geom1])),
          GeomType(int(m.geom_type[s.geom2]))) in single_pt]
  if hits:
    warnings.warn(
        f"{len(hits)} box-box/ellipsoid-box contact pair(s) use a "
        "single-deepest-point contact (no face manifold): fine for "
        "incidental contacts, under-constrained for face-resting "
        "box stacks", stacklevel=3)


@functools.lru_cache(maxsize=64)
def efc_layout(m: Model) -> EfcLayout:
  lim_dof, lim_ten, lim_sign, lim_bound = [], [], [], []
  lim_solref, lim_solimp, lim_margin, lim_iw = [], [], [], []
  for j in range(m.njnt):
    if not m.jnt_limited[j]:
      continue
    if m.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
      continue
    dof = int(m.jnt_dofadr[j])
    for sign, bound in ((1.0, m.jnt_range[j, 0]), (-1.0, m.jnt_range[j, 1])):
      lim_dof.append(dof)
      lim_ten.append(-1)
      lim_sign.append(sign)
      lim_bound.append(float(bound))
      lim_solref.append(m.jnt_solref[j])
      lim_solimp.append(m.jnt_solimp[j])
      lim_margin.append(float(m.jnt_margin[j]))
      lim_iw.append(float(m.dof_invweight0[dof]))
  for t in range(m.ntendon):
    if not m.tendon_limited[t]:
      continue
    for sign, bound in ((1.0, m.tendon_range[t, 0]),
                        (-1.0, m.tendon_range[t, 1])):
      lim_dof.append(-1)
      lim_ten.append(t)
      lim_sign.append(sign)
      lim_bound.append(float(bound))
      lim_solref.append(m.tendon_solref_lim[t])
      lim_solimp.append(m.tendon_solimp_lim[t])
      lim_margin.append(0.0)
      lim_iw.append(float(m.tendon_invweight0[t]))
  nlimit = len(lim_dof)

  con_id, dirsign, diridx, mu = [], [], [], []
  c_solref, c_solimp, c_margin, c_iw = [], [], [], []
  body1, body2, incmargin = [], [], []
  point = 0
  _warn_single_point_pairs(m)
  for s in m.contact_slots:
    b1 = int(m.geom_bodyid[s.geom1])
    b2 = int(m.geom_bodyid[s.geom2])
    iw = float(m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0])
    inc = s.margin - s.gap
    for _ in range(s.max_points):
      body1.append(b1)
      body2.append(b2)
      incmargin.append(inc)
      if s.condim > 3:
        # torsional/rolling pyramid rows need rotational base directions
        # at the contact (a 6-row base); the stored base is translational
        # (ncon, 3). Guard rather than silently composing garbage rows.
        raise NotImplementedError(
            f"condim={s.condim} contacts (torsional/rolling friction) are "
            "not supported; BASELINE models use condim<=3")
      if s.condim == 1:
        rows = [(0.0, 0, 0.0, iw)]
      else:
        # pyramidal: pairs (normal + mu*t_k, normal - mu*t_k)
        rows = []
        # mj_makeImpedance pyramidal diagApprox: 2 mu^2 (1 + mu^2) iw,
        # with mu = friction[0] for EVERY pyramid row (MuJoCo uses the
        # first/sliding coefficient in the diag formula even for the
        # torsional/rolling directions — verified empirically via efc_R;
        # per-direction mu here would put efc_D off by ~mu_k^2/mu_0^2,
        # i.e. orders of magnitude for torsional mu=0.005). The mu^2
        # factor itself is easy to drop and shows up as a ~mu^2-off
        # efc_D => wrong constraint softness in the truncated-solver
        # training regime. Per-direction mu_k is still what scales the
        # tangent direction in the Jacobian composition.
        mu0 = s.friction[0]
        diag = 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * iw
        for k in range(s.condim - 1):
          mu_k = s.friction[k]
          rows.append((1.0, k + 1, mu_k, diag))
          rows.append((-1.0, k + 1, mu_k, diag))
      for sgn, tidx, mu_k, diag in rows:
        con_id.append(point)
        dirsign.append(sgn)
        diridx.append(tidx)
        mu.append(mu_k)
        c_solref.append(s.solref)
        c_solimp.append(s.solimp)
        c_margin.append(inc)
        c_iw.append(diag)
      point += 1

  def arr(x, dt=np.float64):
    return np.array(x, dt) if len(x) else np.zeros((0,), dt)

  return EfcLayout(
      nefc=nlimit + len(con_id), nlimit=nlimit,
      lim_dof=arr(lim_dof, np.int32), lim_tendon=arr(lim_ten, np.int32),
      lim_sign=arr(lim_sign), lim_bound=arr(lim_bound),
      lim_solref=np.array(lim_solref).reshape(nlimit, 2),
      lim_solimp=np.array(lim_solimp).reshape(nlimit, 5),
      lim_margin=arr(lim_margin), lim_invweight=arr(lim_iw),
      ncon_rows=len(con_id),
      con_id=arr(con_id, np.int32), con_dirsign=arr(dirsign),
      con_diridx=arr(diridx, np.int32), con_mu=arr(mu),
      con_solref=np.array(c_solref).reshape(-1, 2),
      con_solimp=np.array(c_solimp).reshape(-1, 5),
      con_margin=arr(c_margin), con_invweight=arr(c_iw),
      con_body1=arr(body1, np.int32), con_body2=arr(body2, np.int32),
      con_includemargin=arr(incmargin),
  )


def _impedance(solimp, pos, margin, dtype):
  """mj_makeImpedance: position-dependent constraint impedance."""
  # endpoints are clamped to the legal impedance range BEFORE interpolation
  d0 = jnp.clip(jnp.asarray(solimp[..., 0], dtype), _MINIMP, _MAXIMP)
  dmax = jnp.clip(jnp.asarray(solimp[..., 1], dtype), _MINIMP, _MAXIMP)
  width = jnp.asarray(solimp[..., 2], dtype)
  mid = jnp.asarray(solimp[..., 3], dtype)
  power = jnp.asarray(solimp[..., 4], dtype)
  x = jnp.abs(pos - margin) / jnp.maximum(width, _MINVAL)
  x = jnp.clip(x, 0.0, 1.0)
  pw = jnp.maximum(power, 1.0)
  a = 1.0 / jnp.maximum(mid, _MINVAL) ** (pw - 1.0)
  b = 1.0 / jnp.maximum(1.0 - mid, _MINVAL) ** (pw - 1.0)
  y = jnp.where(x < mid, a * x ** pw, 1.0 - b * (1.0 - x) ** pw)
  imp = d0 + y * (dmax - d0)
  return jnp.clip(imp, _MINIMP, _MAXIMP)


def _kbi(solref, solimp, timestep, dtype):
  """Stiffness/damping from solref, normalized by d_max (mj semantics).

  Standard form (timeconst, dampratio > 0):
    b = 2/(dmax*timeconst),  k = 1/(dmax^2 * timeconst^2 * dampratio^2)
  Direct form (non-positive solref): k = -solref0/dmax^2, b = -solref1/dmax.
  refsafe clamps timeconst >= 2*timestep.
  """
  timeconst = jnp.asarray(solref[..., 0], dtype)
  dampratio = jnp.asarray(solref[..., 1], dtype)
  timeconst = jnp.maximum(timeconst, 2.0 * timestep)
  dmax = jnp.clip(jnp.asarray(solimp[..., 1], dtype), _MINIMP, _MAXIMP)
  k = 1.0 / jnp.maximum((dmax * timeconst * dampratio) ** 2, _MINVAL)
  b = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(solref[..., 0] <= 0, -solref[..., 0] / dmax ** 2, k)
  b = jnp.where(solref[..., 1] <= 0, -solref[..., 1] / dmax, b)
  return k, b


# ---------------------------------------------------------------------------
# Structured Jacobian operator: the dense (nefc, nv) matrix is never
# materialized in the hot path. Joint-limit rows have a single static +-1
# column; tendon-limit rows are sign * ten_J[t]; each contact point's
# 1 + 2*(condim-1) pyramid rows derive from its 3 stored base rows.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _op_tables(m: Model):
  """Static numpy tables for efc_matvec / efc_rmatvec.

  Everything static lives in two compile-time-constant matrices so the
  batched operator is pure MXU matmuls (tiny gathers/scatters are slow on
  TPU):
  - J_lim (nlimit, nv): the FULL limit-row Jacobian. Joint rows are +-1
    columns; fixed-tendon rows are sign * wrap coefficients — both known
    at compile time.
  - C (ncon_rows, 3*ncon): pyramid-row composition over the flattened
    per-point base rows [normal, t1, t2]: row = n + dirsign*mu*t.
  """
  lay = efc_layout(m)
  is_joint = lay.lim_dof >= 0
  J_lim = np.zeros((lay.nlimit, m.nv))
  J_lim[np.arange(lay.nlimit)[is_joint], lay.lim_dof[is_joint]] = \
      lay.lim_sign[is_joint]
  for i in range(lay.nlimit):
    if lay.lim_tendon[i] >= 0:
      t = int(lay.lim_tendon[i])
      adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
      for w in range(adr, adr + num):
        dof = int(m.jnt_dofadr[int(m.wrap_jntid[w])])
        J_lim[i, dof] = lay.lim_sign[i] * float(m.wrap_coef[w])
  ncr = lay.ncon_rows
  if ncr * 3 * m.ncon_max > _C_DENSE_LIMIT:
    # contact-heavy models (rodent_cpu: ~23k rows x ~14k base cols would
    # be GBs): skip the dense composition matrix; callers use the
    # 2-sparse gather/scatter path instead
    C = None
  else:
    C = np.zeros((ncr, 3 * m.ncon_max))
    if ncr:
      r = np.arange(ncr)
      C[r, 3 * lay.con_id] = 1.0
      has_t = lay.con_diridx > 0
      C[r[has_t], 3 * lay.con_id[has_t] + lay.con_diridx[has_t]] = \
          (lay.con_dirsign * lay.con_mu)[has_t]
  return lay, J_lim, C


def _compose_rows(lay, base: jax.Array) -> jax.Array:
  """Pyramid rows from per-point base rows WITHOUT the dense C matrix:
  row = normal + dirsign*mu*tangent (2-sparse gather). base: (ncon, 3)
  or (ncon, 3, nv) -> (ncon_rows,) or (ncon_rows, nv)."""
  rid = jnp.asarray(lay.con_id, jnp.int32)
  didx = jnp.asarray(lay.con_diridx, jnp.int32)
  coef = jnp.asarray(lay.con_dirsign * lay.con_mu, base.dtype)
  if base.ndim == 2:
    return base[rid, 0] + coef * base[rid, didx]
  return base[rid, 0] + coef[:, None] * base[rid, didx]


def _decompose_rows(lay, ncon: int, f: jax.Array) -> jax.Array:
  """Transpose of _compose_rows: (ncon_rows,) -> (ncon, 3) scatter-add."""
  rid = jnp.asarray(lay.con_id, jnp.int32)
  didx = jnp.asarray(lay.con_diridx, jnp.int32)
  coef = jnp.asarray(lay.con_dirsign * lay.con_mu, f.dtype)
  out = jnp.zeros((ncon, 3), f.dtype)
  out = out.at[rid, 0].add(f)
  out = out.at[rid, didx].add(coef * f)
  return out


def efc_matvec(m: Model, con_Jbase: jax.Array, x: jax.Array) -> jax.Array:
  """J @ x without materializing J. x: (nv,) -> (nefc,)."""
  dt = x.dtype
  lay, J_lim, C = _op_tables(m)
  parts = []
  if lay.nlimit:
    parts.append(jnp.asarray(J_lim, dt) @ x)
  if lay.ncon_rows:
    base = con_Jbase @ x                             # (ncon, 3)
    if C is None:
      parts.append(_compose_rows(lay, base))
    else:
      parts.append(jnp.asarray(C, dt) @ base.ravel())
  return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def efc_rmatvec(m: Model, con_Jbase: jax.Array, f: jax.Array) -> jax.Array:
  """J^T @ f without materializing J. f: (nefc,) -> (nv,)."""
  dt = f.dtype
  lay, J_lim, C = _op_tables(m)
  out = jnp.zeros(m.nv, dt)
  if lay.nlimit:
    out = out + jnp.asarray(J_lim, dt).T @ f[:lay.nlimit]
  if lay.ncon_rows:
    if C is None:
      c = _decompose_rows(lay, m.ncon_max, f[lay.nlimit:])
    else:
      c = (jnp.asarray(C, dt).T @ f[lay.nlimit:]).reshape(m.ncon_max, 3)
    out = out + jnp.einsum("cdv,cd->v", con_Jbase, c)
  return out


def dense_efc_J(m: Model, d: Data) -> jax.Array:
  """Materialize the dense (nefc, nv) Jacobian (tests / Newton precond /
  debugging only — never in the CG hot path)."""
  dt = d.qpos.dtype
  lay, J_lim, C = _op_tables(m)
  blocks = []
  if lay.nlimit:
    blocks.append(jnp.asarray(J_lim, dt))
  if lay.ncon_rows:
    if C is None:
      blocks.append(_compose_rows(lay, d.con_Jbase))
    else:
      base = d.con_Jbase.reshape(3 * m.ncon_max, m.nv)
      blocks.append(jnp.asarray(C, dt) @ base)
  return jnp.concatenate(blocks) if len(blocks) > 1 else blocks[0]


def make_constraint(m: Model, d: Data) -> Data:
  """Assemble efc arrays from limits + current contacts."""
  dt = d.qpos.dtype
  lay = efc_layout(m)
  nv, nefc = m.nv, lay.nefc
  if nefc == 0 or (m.opt.disableflags & DisableBit.CONSTRAINT):
    return d.replace(con_Jbase=jnp.zeros((m.ncon_max, 3, nv), dt),
                     efc_D=jnp.zeros(lay.nefc, dt),
                     efc_aref=jnp.zeros(lay.nefc, dt),
                     efc_pos=jnp.zeros(lay.nefc, dt),
                     efc_margin=jnp.zeros(lay.nefc, dt),
                     efc_active=jnp.zeros(lay.nefc, bool))
  ts = jnp.asarray(m.opt.timestep, dt)
  mk = masks(m)

  Ds, arefs, poss, margins, actives = [], [], [], [], []
  con_Jbase = jnp.zeros((m.ncon_max, 3, nv), dt)

  # ---- limit rows -------------------------------------------------------
  if lay.nlimit and not (m.opt.disableflags & DisableBit.LIMIT):
    sign = jnp.asarray(lay.lim_sign, dt)
    bound = jnp.asarray(lay.lim_bound, dt)
    is_joint = lay.lim_dof >= 0
    qadr = np.where(
        is_joint,
        m.jnt_qposadr[m.dof_jntid[np.maximum(lay.lim_dof, 0)]], 0)
    tadr = np.maximum(lay.lim_tendon, 0)
    vals = jnp.where(jnp.asarray(is_joint),
                     d.qpos[jnp.asarray(qadr, jnp.int32)],
                     d.ten_length[jnp.asarray(tadr, jnp.int32)]
                     if m.ntendon else 0.0)
    # row velocity J@qvel via the static limit Jacobian
    _, J_lim, _ = _op_tables(m)
    vel = jnp.asarray(J_lim, dt) @ d.qvel
    # distance to the limit: lower: q - lo ; upper: hi - q
    dist = sign * (vals - bound)
    margin = jnp.asarray(lay.lim_margin, dt)
    active = dist < margin
    imp = _impedance(jnp.asarray(lay.lim_solimp, dt), dist, margin, dt)
    k, b = _kbi(jnp.asarray(lay.lim_solref, dt),
                jnp.asarray(lay.lim_solimp, dt), ts, dt)
    aref = -b * vel - k * imp * (dist - margin)
    R = jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL)
                    * jnp.asarray(lay.lim_invweight, dt), _MINVAL)
    D = jnp.where(active, 1.0 / R, 0.0)
    Ds.append(D)
    arefs.append(aref)
    poss.append(dist)
    margins.append(margin)
    actives.append(active)
  elif lay.nlimit:
    Ds.append(jnp.zeros(lay.nlimit, dt))
    arefs.append(jnp.zeros(lay.nlimit, dt))
    poss.append(jnp.zeros(lay.nlimit, dt))
    margins.append(jnp.zeros(lay.nlimit, dt))
    actives.append(jnp.zeros(lay.nlimit, bool))

  # ---- contact rows ------------------------------------------------------
  if lay.ncon_rows and not (m.opt.disableflags & DisableBit.CONTACT):
    pos_c = d.contact.pos                                  # (ncon, 3)
    frame = d.contact.frame                                # (ncon, 3, 3)
    dist = d.contact.dist

    # translational jacobian of each contact point wrt both bodies
    bd_mask = jnp.asarray(mk.body_dof_ancestor, dt)        # (nbody, nv)
    org = d.subtree_com[m.body_rootid]                     # (nbody, 3)
    cdof_ang = d.cdof[:, :3]
    cdof_lin = d.cdof[:, 3:]

    def point_jac(bodies):
      mask = bd_mask[bodies]                               # (ncon, nv)
      rel = pos_c[:, None, :] - org[bodies][:, None, :]    # (ncon, 1, 3)
      jacp = cdof_lin[None] + jnp.cross(cdof_ang[None], rel)
      return jacp * mask[:, :, None]                       # (ncon, nv, 3)

    jac_rel = point_jac(lay.con_body2) - point_jac(lay.con_body1)
    # 3 base rows per point: [normal, tangent1, tangent2] . jac
    con_Jbase = jnp.einsum('cvk,cdk->cdv', jac_rel, frame)  # (ncon, 3, nv)

    rid = lay.con_id                                       # (nrows,)
    _, _, C = _op_tables(m)
    base_vel = con_Jbase @ d.qvel                          # (ncon, 3)
    if C is None:
      vel = _compose_rows(lay, base_vel)
    else:
      vel = jnp.asarray(C, dt) @ base_vel.ravel()

    pos_r = dist[rid]
    margin = jnp.asarray(lay.con_margin, dt)
    active = pos_r < jnp.asarray(lay.con_includemargin, dt)[rid]
    imp = _impedance(jnp.asarray(lay.con_solimp, dt), pos_r, margin, dt)
    k, b = _kbi(jnp.asarray(lay.con_solref, dt),
                jnp.asarray(lay.con_solimp, dt), ts, dt)
    aref = -b * vel - k * imp * (pos_r - margin)
    R = jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL)
                    * jnp.asarray(lay.con_invweight, dt), _MINVAL)
    D = jnp.where(active, 1.0 / R, 0.0)
    Ds.append(D)
    arefs.append(aref)
    poss.append(pos_r)
    margins.append(margin)
    actives.append(active)
  elif lay.ncon_rows:
    Ds.append(jnp.zeros(lay.ncon_rows, dt))
    arefs.append(jnp.zeros(lay.ncon_rows, dt))
    poss.append(jnp.zeros(lay.ncon_rows, dt))
    margins.append(jnp.zeros(lay.ncon_rows, dt))
    actives.append(jnp.zeros(lay.ncon_rows, bool))

  return d.replace(
      con_Jbase=con_Jbase, efc_D=jnp.concatenate(Ds),
      efc_aref=jnp.concatenate(arefs), efc_pos=jnp.concatenate(poss),
      efc_margin=jnp.concatenate(margins),
      efc_active=jnp.concatenate(actives))
