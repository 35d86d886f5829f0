"""Fused implicit-dynamics Pallas TPU kernel.

One kernel per 128-env lane block computes, entirely VMEM-resident:

  CRB mass matrix -> Cholesky factor + inverse -> smooth acceleration
  -> constraint assembly (limit + pyramidal contact rows, solref/solimp
  impedance) -> primal CG solve -> implicit joint-damping velocity update

replacing the five hottest XLA stages of the physics substep
(crb+factor, make_constraint, fwd_acceleration, solve, euler's damping
CG — together ~8 ms of a 10.8 ms substep at 2048 envs, profile_stages).
The win is HBM traffic: the unfused pipeline round-trips qM (21 KB/env),
qMinv (21 KB/env) and con_Jbase (50 KB/env) through HBM several times
per substep; the fused kernel reads only the ~8 KB/env of true inputs
(cinert, cdof, qpos, qvel, qfrc_smooth, contact data) and writes the
~2.5 KB/env of true outputs.

Numerical semantics match the stage pipeline exactly — the layout
(batch-in-lanes), the symmetric axis-0 matvec trick, and the in-place
Cholesky come from ops/cg.py and ops/cholesky.py which are individually
verified against the stage path. Equivalence of this kernel is tested in
interpret mode (tests/test_ops.py::test_fused_kernel_matches_core).

Reference behavior contract: MJX forward + Euler semantics as exercised
by Rodent_Env_Brax.py:42-57 (CG solver, dense jacobian, 10 substeps);
constraint model per MuJoCo solref/solimp (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.constraint import _op_tables, efc_layout
from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import (
    Data, DisableBit, Model, SolverType)

_LANES = 128
_MINIMP = 0.0001
_MAXIMP = 0.9999
_MINVAL = 1e-15

FORCE_INTERPRET = False


def _round_up(x, m):
  return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# static tables
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Statics:
  """Host-side constant matrices/vectors consumed by the kernel."""
  # CRB
  subtree: np.ndarray        # (nbody, nbody) subtree-sum mask
  dofsel: np.ndarray         # (nv, nbody) one-hot: dof -> body
  qm_mask: np.ndarray        # (nv, nv) ancestor mask (full symmetric)
  armature: np.ndarray       # (nv,)
  # limit rows
  J_lim: np.ndarray          # (nlimit, nv)
  qsel_signed: np.ndarray    # (nlimit, nq) sign * one-hot(qposadr)
  lim_sb: np.ndarray         # (nlimit,) sign * bound
  lim_k: np.ndarray          # (nlimit,)
  lim_b: np.ndarray          # (nlimit,)
  lim_margin: np.ndarray     # (nlimit,)
  lim_iw: np.ndarray         # (nlimit,)
  lim_d0: np.ndarray
  lim_dmax: np.ndarray
  lim_width: np.ndarray
  lim_mid: np.ndarray
  lim_pw: np.ndarray
  # contact rows
  C: np.ndarray              # (ncr, 3*ncon)
  rid: np.ndarray            # (ncr, ncon) one-hot row -> point
  cmask2: np.ndarray         # (ncon, nv) dof mask of body2 per point
  cmask1: np.ndarray         # (ncon, nv) dof mask of body1 per point
  body1_zero: bool           # True when cmask1 is identically 0
  con_k: np.ndarray          # (ncr,)
  con_b: np.ndarray          # (ncr,)
  con_margin: np.ndarray     # (ncr,)
  con_incmargin: np.ndarray  # (ncr,) includemargin per row
  con_iw: np.ndarray         # (ncr,)
  con_d0: np.ndarray
  con_dmax: np.ndarray
  con_width: np.ndarray
  con_mid: np.ndarray
  con_pw: np.ndarray
  # sizes
  nv: int
  nq: int
  nbody: int
  ncon: int
  nlimit: int
  ncr: int
  # integration
  h: float
  dof_damping: np.ndarray    # (nv,)
  eulerdamp: bool


def _kbi_static(solref, solimp, timestep):
  """Static stiffness/damping per row (constraint._kbi on numpy)."""
  timeconst = np.maximum(solref[:, 0], 2.0 * timestep)
  dampratio = solref[:, 1]
  dmax = np.clip(solimp[:, 1], _MINIMP, _MAXIMP)
  k = 1.0 / np.maximum((dmax * timeconst * dampratio) ** 2, _MINVAL)
  b = 2.0 / np.maximum(dmax * timeconst, _MINVAL)
  k = np.where(solref[:, 0] <= 0, -solref[:, 0] / dmax ** 2, k)
  b = np.where(solref[:, 1] <= 0, -solref[:, 1] / dmax, b)
  return k, b


@functools.lru_cache(maxsize=16)
def statics(m: Model) -> _Statics:
  lay, J_lim, C = _op_tables(m)
  mk = masks(m)
  ts = float(m.opt.timestep)

  qsel = np.zeros((lay.nlimit, m.nq))
  is_joint = lay.lim_dof >= 0
  qadr = np.where(
      is_joint, m.jnt_qposadr[m.dof_jntid[np.maximum(lay.lim_dof, 0)]], 0)
  r = np.arange(lay.nlimit)
  qsel[r[is_joint], qadr[is_joint]] = lay.lim_sign[is_joint]
  # tendon-limit rows would need ten_length; eligibility gates ntendon==0

  lim_k, lim_b = _kbi_static(lay.lim_solref, lay.lim_solimp, ts)
  con_k, con_b = _kbi_static(lay.con_solref, lay.con_solimp, ts)

  rid = np.zeros((lay.ncon_rows, m.ncon_max))
  rid[np.arange(lay.ncon_rows), lay.con_id] = 1.0

  # con_body1/2 are per contact POINT (ncon,)
  cmask1 = np.asarray(mk.body_dof_ancestor, np.float64)[lay.con_body1]
  cmask2 = np.asarray(mk.body_dof_ancestor, np.float64)[lay.con_body2]

  def clipimp(x):
    return np.clip(x, _MINIMP, _MAXIMP)

  # upper-triangle ancestor mask INCLUDING the diagonal (smooth.crb uses
  # exactly this to select the side computed with the deeper body's
  # composite inertia)
  qm_mask = np.asarray(mk.qm_upper, np.float64)

  return _Statics(
      subtree=np.asarray(mk.body_subtree, np.float64),
      dofsel=np.eye(m.nbody)[np.asarray(m.dof_bodyid)],
      qm_mask=qm_mask.astype(np.float64),
      armature=np.asarray(m.dof_armature, np.float64),
      J_lim=J_lim, qsel_signed=qsel,
      lim_sb=lay.lim_sign * lay.lim_bound,
      lim_k=lim_k, lim_b=lim_b, lim_margin=lay.lim_margin,
      lim_iw=lay.lim_invweight,
      lim_d0=clipimp(lay.lim_solimp[:, 0]),
      lim_dmax=clipimp(lay.lim_solimp[:, 1]),
      lim_width=np.maximum(lay.lim_solimp[:, 2], _MINVAL),
      lim_mid=lay.lim_solimp[:, 3], lim_pw=lay.lim_solimp[:, 4],
      C=C, rid=rid, cmask2=cmask2, cmask1=cmask1,
      body1_zero=not np.any(cmask1),
      con_k=con_k, con_b=con_b, con_margin=lay.con_margin,
      con_incmargin=lay.con_includemargin[lay.con_id],
      con_iw=lay.con_invweight,
      con_d0=clipimp(lay.con_solimp[:, 0]),
      con_dmax=clipimp(lay.con_solimp[:, 1]),
      con_width=np.maximum(lay.con_solimp[:, 2], _MINVAL),
      con_mid=lay.con_solimp[:, 3], con_pw=lay.con_solimp[:, 4],
      nv=m.nv, nq=m.nq, nbody=m.nbody, ncon=m.ncon_max,
      nlimit=lay.nlimit, ncr=lay.ncon_rows,
      h=ts, dof_damping=np.asarray(m.dof_damping, np.float64),
      eulerdamp=(not (m.opt.disableflags & DisableBit.EULERDAMP)
                 and bool(np.any(m.dof_damping > 0))),
  )


def eligible(m: Model) -> bool:
  """Fused path is valid for this model (CG solver, no tendon limits,
  constraints enabled, unrollable iteration counts)."""
  if os.environ.get("BRR_NO_FUSED"):
    return False
  lay = efc_layout(m)
  return (m.opt.solver == SolverType.CG
          and m.opt.iterations <= 16
          and m.opt.ls_iterations <= 16
          and lay.nefc > 0
          and m.ncon_max > 0 and lay.ncon_rows > 0 and lay.nlimit > 0
          and not np.any(lay.lim_tendon >= 0)
          and not (m.opt.disableflags
                   & (DisableBit.CONSTRAINT | DisableBit.LIMIT
                      | DisableBit.CONTACT)))


# ---------------------------------------------------------------------------
# XLA core (unbatched): exact composition of the stage pipeline. This is
# the semantic definition; the kernel must match it.
# ---------------------------------------------------------------------------


def _core(m: Model, qpos, qvel, cinert, cdof, qfrc_smooth,
          con_dist, con_pos, con_frame, subtree_com):
  from brax_rodent_run_tpu.physics import constraint as constraint_mod
  from brax_rodent_run_tpu.physics import smooth as smooth_mod
  from brax_rodent_run_tpu.physics import solver as solver_mod
  from brax_rodent_run_tpu.physics.types import make_data

  d = make_data(m, dtype=qpos.dtype)
  d = d.replace(qpos=qpos, qvel=qvel, cinert=cinert, cdof=cdof,
                subtree_com=subtree_com,
                contact=d.contact.replace(dist=con_dist, pos=con_pos,
                                          frame=con_frame))
  d = smooth_mod.crb(m, d)                        # qM + qMinv
  d = constraint_mod.make_constraint(m, d)
  qacc_smooth = smooth_mod.solve_m(m, d, qfrc_smooth)
  d = d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
  d = solver_mod.solve(m, d)

  st = statics(m)
  qacc_int = d.qacc
  if st.eulerdamp:
    dt = qpos.dtype
    h = jnp.asarray(st.h, dt)
    qfrc = qfrc_smooth + d.qfrc_constraint
    # EXACT solve, matching forward.euler (mj_solveLD semantics)
    from brax_rodent_run_tpu.ops.cholesky import spd_inverse
    MhB = d.qM + h * jnp.diag(jnp.asarray(st.dof_damping, dt))
    qacc_int = spd_inverse(MhB) @ qfrc
  qvel_new = qvel + jnp.asarray(st.h, qpos.dtype) * qacc_int
  return (d.qacc, d.qacc_smooth, d.qfrc_constraint, d.efc_force, qvel_new)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _fused_kernel(m: Model, interpret: bool = False):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from brax_rodent_run_tpu.ops.cholesky import chol_routines
  _chol_inplace, _inv_from_chol_inplace = chol_routines()

  st = statics(m)
  nv, nq, nbody = st.nv, st.nq, st.nbody
  ncon, nlimit, ncr = st.ncon, st.nlimit, st.ncr
  nc3 = 3 * ncon
  np_ = _round_up(nv, 8)
  E = _LANES
  iters = int(m.opt.iterations)
  n_ls = max(int(m.opt.ls_iterations) - 1, 0)
  tol = float(m.opt.tolerance) * float(max(nv, 1))
  f32 = np.float32

  # ---- consts (numpy; passed to the kernel as broadcast VMEM inputs —
  # Pallas cannot embed array constants, and numpy avoids tracer leaks
  # from this lru-cached factory)
  # all dof-space tables are padded to np_ rows/cols so the kernel never
  # performs sublane-misaligned writes (Mosaic silently corrupts them);
  # the pad block of the mass matrix is the identity so the full padded
  # matrix factors/inverts cleanly and pad dofs stay exactly zero.
  def padr(x, rows=None, cols=None):
    out = np.zeros((rows or x.shape[0], cols or x.shape[1]), f32)
    out[:x.shape[0], :x.shape[1]] = x
    return out

  DS = padr((st.dofsel @ st.subtree), rows=np_)    # (np_, nbody)
  QMU = padr(st.qm_mask, rows=np_, cols=np_)
  QML = padr(st.qm_mask.T * (1.0 - np.eye(nv)), rows=np_, cols=np_)
  ARMAD = padr(np.diag(st.armature), rows=np_, cols=np_)
  ARMAD[range(nv, np_), range(nv, np_)] = 1.0      # identity pad block
  JLIM = padr(st.J_lim, cols=np_)                  # (nlimit, np_)
  QSEL = st.qsel_signed.astype(f32)                # (nlimit, nq)
  CMAT = st.C.astype(f32)                          # (ncr, nc3)
  RID = st.rid.astype(f32)                         # (ncr, ncon)
  # per-row scalar tables packed column-wise: [sb/0, k, b, margin,
  # inc(margin), iw, d0, dmax, width, mid, pw] -> (rows, 16) zero-padded
  def tab(*cols):
    t = np.stack([c.astype(np.float64) for c in cols], axis=1)
    out = np.zeros((t.shape[0], 16), f32)
    out[:, :t.shape[1]] = t
    return out

  LTAB = tab(st.lim_sb, st.lim_k, st.lim_b, st.lim_margin, st.lim_margin,
             st.lim_iw, st.lim_d0, st.lim_dmax, st.lim_width, st.lim_mid,
             st.lim_pw)
  CTAB = tab(np.zeros(ncr), st.con_k, st.con_b, st.con_margin,
             st.con_incmargin, st.con_iw, st.con_d0, st.con_dmax,
             st.con_width, st.con_mid, st.con_pw)
  HBD = padr((st.h * st.dof_damping)[:, None], rows=np_)  # (np_, 1)
  H = float(st.h)
  # expand (c,) -> (3 rows per c), frame-row-major (c0d0,c0d1,c0d2,...)
  EXP3 = np.kron(np.eye(ncon), np.ones((3, 1))).astype(f32)  # (nc3, ncon)
  CM2R = padr(EXP3 @ st.cmask2, cols=np_)          # (nc3, np_)
  CM1R = padr(EXP3 @ st.cmask1, cols=np_)
  body1_zero = st.body1_zero
  eulerdamp = st.eulerdamp

  consts = [DS, QMU, QML, ARMAD, JLIM, QSEL, CMAT, RID, LTAB, CTAB,
            HBD, EXP3, CM2R] + ([] if body1_zero else [CM1R])
  all_pw2 = bool(np.all(st.lim_pw == 2.0) and np.all(st.con_pw == 2.0))

  def kernel(*refs):
    nconsts = len(consts)
    (ds_ref, qmu_ref, qml_ref, armad_ref, jlim_ref, qsel_ref, cmat_ref,
     rid_ref, ltab_ref, ctab_ref, hbd_ref, exp3_ref, cm2r_ref) = \
        refs[:13]
    i = 13
    cm1r_ref = None
    if not body1_zero:
      cm1r_ref = refs[i]
      i += 1
    (qpos_ref, qvel_ref, cin_ref, cdof_ref, qfs_ref,
     cdist_ref, rel2_ref, rel1_ref, frame_ref,
     qacc_ref, qaccs_ref, qfc_ref, fl_ref, fc_ref, qvn_ref,
     s_a, s_l, s_x, s_jc) = refs[i:]

    def mxu(a, b):
      return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    DSv = ds_ref[:]
    JLIMv = jlim_ref[:]
    CMATv = cmat_ref[:]
    LT = ltab_ref[:]
    CT = ctab_ref[:]

    qpos = qpos_ref[:]                             # (nq, E)
    qvel = qvel_ref[:]                             # (np_, E) zero-padded
    cin = cin_ref[:]                               # (10*nbody, E) comp-major
    cdof = cdof_ref[:]                             # (6*np_, E) comp-major
    qfs = qfs_ref[:]                               # (np_, E) zero-padded
    cdist = cdist_ref[:]                           # (ncon, E)
    rel2 = rel2_ref[:]                             # (3*ncon, E) comp-major
    frame = frame_ref[:]                           # (3*nc3, E) comp-major

    # ---- CRB: composite inertia -> dense mass matrix ----------------
    # cin comp c slice: cin[c*nbody:(c+1)*nbody]
    crbd = []                                      # per comp (nv, E)
    DS = DSv
    for c in range(10):
      crbd.append(mxu(DS, cin[c * nbody:(c + 1) * nbody]))
    w = [cdof[k * np_:(k + 1) * np_] for k in range(3)]    # angular
    v = [cdof[k * np_:(k + 1) * np_] for k in range(3, 6)]  # linear
    ixx, iyy, izz, ixy, ixz, iyz = crbd[0:6]
    cmx, cmy, cmz, mass = crbd[6], crbd[7], crbd[8], crbd[9]
    # torque = I w + cm x v ; force = m v - cm x w
    F = [
        ixx * w[0] + ixy * w[1] + ixz * w[2] + cmy * v[2] - cmz * v[1],
        ixy * w[0] + iyy * w[1] + iyz * w[2] + cmz * v[0] - cmx * v[2],
        ixz * w[0] + iyz * w[1] + izz * w[2] + cmx * v[1] - cmy * v[0],
        mass * v[0] - (cmy * w[2] - cmz * w[1]),
        mass * v[1] - (cmz * w[0] - cmx * w[2]),
        mass * v[2] - (cmx * w[1] - cmy * w[0]),
    ]
    cd6 = [cdof[k * np_:(k + 1) * np_] for k in range(6)]
    # full[i, j] = cdof_i . I_b(j) cdof_j is only correct when j is the
    # DEEPER dof (composite inertia of j's body): keep upper (i ancestor
    # of j) + diagonal, and build the lower triangle with the operands
    # swapped (F_i . cdof_j) instead of transposing (3D transpose over
    # sublane dims is Mosaic-hostile).
    up = cd6[0][:, None, :] * F[0][None, :, :]
    lo = F[0][:, None, :] * cd6[0][None, :, :]
    for k in range(1, 6):
      up = up + cd6[k][:, None, :] * F[k][None, :, :]
      lo = lo + F[k][:, None, :] * cd6[k][None, :, :]
    qm = (up * qmu_ref[:][:, :, None]
          + lo * qml_ref[:][:, :, None]
          + armad_ref[:][:, :, None])

    def mmul0(mat, x):
      # symmetric (n, n, E) matvec, LEADING-axis reduce (Mosaic-safe)
      return jnp.sum(mat * x[:, None, :], axis=0)

    # ---- factor + invert ------------------------------------------------
    # qm is (np_, np_, E) with an identity pad block: one aligned
    # full-ref write, and the whole padded matrix factors cleanly.
    s_a[:] = qm
    _chol_inplace(np_, np_, s_a, s_l)
    _inv_from_chol_inplace(np_, s_l, s_a, s_x)
    qminv = s_x[:]

    qacc_smooth = mmul0(qminv, qfs)

    # ---- limit rows ---------------------------------------------------
    dist_l = mxu(qsel_ref[:], qpos) - LT[:, 0:1]
    vel_l = mxu(JLIMv, qvel)

    def impedance(x_pos, margin, d0, dmax, width, mid, pw):
      # mirrors constraint._impedance exactly (d0/dmax/width pre-clipped
      # in statics())
      x = jnp.abs(x_pos - margin) / width
      x = jnp.clip(x, 0.0, 1.0)
      if all_pw2:
        a = 1.0 / jnp.maximum(mid, _MINVAL)
        b = 1.0 / jnp.maximum(1.0 - mid, _MINVAL)
        y = jnp.where(x < mid, a * x * x, 1.0 - b * (1.0 - x) * (1.0 - x))
      else:
        pwc = jnp.maximum(pw, 1.0)
        a = 1.0 / jnp.maximum(mid, _MINVAL) ** (pwc - 1.0)
        b = 1.0 / jnp.maximum(1.0 - mid, _MINVAL) ** (pwc - 1.0)
        y = jnp.where(x < mid, a * x ** pwc, 1.0 - b * (1.0 - x) ** pwc)
      return jnp.clip(d0 + y * (dmax - d0), _MINIMP, _MAXIMP)

    imp_l = impedance(dist_l, LT[:, 3:4], LT[:, 6:7], LT[:, 7:8],
                      LT[:, 8:9], LT[:, 9:10], LT[:, 10:11])
    aref_l = (-LT[:, 2:3] * vel_l
              - LT[:, 1:2] * imp_l * (dist_l - LT[:, 3:4]))
    act_l = dist_l < LT[:, 3:4]
    R_l = jnp.maximum((1.0 - imp_l) / jnp.maximum(imp_l, _MINVAL)
                      * LT[:, 5:6], _MINVAL)
    D_l = jnp.where(act_l, 1.0 / R_l, 0.0)

    # ---- contact base jacobian ---------------------------------------
    # rows (c,d) = frame row d of contact c; comp-major slices
    fx = frame[0 * nc3:1 * nc3]                    # (nc3, E)
    fy = frame[1 * nc3:2 * nc3]
    fz = frame[2 * nc3:3 * nc3]
    EXP = exp3_ref[:]
    ex = mxu(EXP, rel2[0 * ncon:1 * ncon])         # rel2 expanded to rows
    ey = mxu(EXP, rel2[1 * ncon:2 * ncon])
    ez = mxu(EXP, rel2[2 * ncon:3 * ncon])
    # g = rel x f (per row)
    gx = ey * fz - ez * fy
    gy = ez * fx - ex * fz
    gz = ex * fy - ey * fx
    # jc[r, v] = sum_k f_k[r] cdof_lin_k[v] + g_k[r] cdof_ang_k[v]
    s_jc[:] = (fx[:, None, :] * v[0][None, :, :]
               + fy[:, None, :] * v[1][None, :, :]
               + fz[:, None, :] * v[2][None, :, :]
               + gx[:, None, :] * w[0][None, :, :]
               + gy[:, None, :] * w[1][None, :, :]
               + gz[:, None, :] * w[2][None, :, :])
    if st.body1_zero:
      s_jc[:] = s_jc[:] * cm2r_ref[:][:, :, None]
    else:
      rel1 = rel1_ref[:]
      e1x = mxu(EXP, rel1[0 * ncon:1 * ncon])
      e1y = mxu(EXP, rel1[1 * ncon:2 * ncon])
      e1z = mxu(EXP, rel1[2 * ncon:3 * ncon])
      g1x = e1y * fz - e1z * fy
      g1y = e1z * fx - e1x * fz
      g1z = e1x * fy - e1y * fx
      jc1 = (fx[:, None, :] * v[0][None, :, :]
             + fy[:, None, :] * v[1][None, :, :]
             + fz[:, None, :] * v[2][None, :, :]
             + g1x[:, None, :] * w[0][None, :, :]
             + g1y[:, None, :] * w[1][None, :, :]
             + g1z[:, None, :] * w[2][None, :, :])
      s_jc[:] = (s_jc[:] * cm2r_ref[:][:, :, None]
                 - jc1 * cm1r_ref[:][:, :, None])

    jc = s_jc[:]

    def matvec(x):                                 # (nv, E) -> pair
      lim = mxu(JLIMv, x)
      con = mxu(CMATv, jnp.sum(jc * x[None, :, :], axis=1))
      return (lim, con)

    def rmatvec(f):                                # pair -> (nv, E)
      out = mxu(JLIMv.T, f[0])
      cb = mxu(CMATv.T, f[1])                      # (nc3, E)
      return out + jnp.sum(jc * cb[:, None, :], axis=0)

    # ---- contact rows -------------------------------------------------
    pos_c = mxu(rid_ref[:], cdist)                 # (ncr, E)
    vel_c = mxu(CMATv, jnp.sum(jc * qvel[None, :, :], axis=1))
    imp_c = impedance(pos_c, CT[:, 3:4], CT[:, 6:7], CT[:, 7:8],
                      CT[:, 8:9], CT[:, 9:10], CT[:, 10:11])
    aref_c = (-CT[:, 2:3] * vel_c
              - CT[:, 1:2] * imp_c * (pos_c - CT[:, 3:4]))
    act_c = pos_c < CT[:, 4:5]
    R_c = jnp.maximum((1.0 - imp_c) / jnp.maximum(imp_c, _MINVAL)
                      * CT[:, 5:6], _MINVAL)
    D_c = jnp.where(act_c, 1.0 / R_c, 0.0)

    D = (D_l, D_c)
    aref = (aref_l, aref_c)

    # ---- primal CG (ops/cg.py semantics) ------------------------------
    def pmap2(f, a, b):
      return tuple(f(x, y) for x, y in zip(a, b))

    def psum(a):
      return sum(jnp.sum(x, axis=0) for x in a)

    def dterm_of(jar):
      return pmap2(lambda j, dd: jnp.where(j < 0, dd, 0.0), jar, D)

    def cost(x, jar):
      dterm = dterm_of(jar)
      dx = x - qacc_smooth
      gauss = 0.5 * jnp.sum(dx * mmul0(qm, dx), axis=0)
      pen = 0.5 * psum(pmap2(lambda t, j: t * j * j, dterm, jar))
      return gauss + pen, dterm

    def grad_fn(x, jar, dterm):
      return mmul0(qm, x - qacc_smooth) + rmatvec(
          pmap2(lambda t, j: t * j, dterm, jar))

    x = qacc_smooth
    jar = pmap2(lambda a, b: a - b, matvec(x), aref)
    cur_cost, dterm = cost(x, jar)
    g = grad_fn(x, jar, dterm)
    Mg = mmul0(qminv, g)
    p = -Mg
    done = jnp.zeros((1, E), bool)
    prev_g, prev_Mg = g, Mg

    for _ in range(iters):
      Jp = matvec(p)
      pMp = jnp.sum(p * mmul0(qm, p), axis=0)
      pMdx = jnp.sum(p * mmul0(qm, x - qacc_smooth), axis=0)

      def dphi(alpha, jar=jar, Jp=Jp, pMp=pMp, pMdx=pMdx):
        j = pmap2(lambda a, b: a + alpha[None, :] * b, jar, Jp)
        dt_ = dterm_of(j)
        jJp = pmap2(lambda a, b: a * b, j, Jp)
        gg = pMdx + alpha * pMp + psum(pmap2(lambda t, u: t * u, dt_, jJp))
        hh = pMp + psum(pmap2(lambda t, b: t * b * b, dt_, Jp))
        return gg, hh

      g0, h0 = dphi(jnp.zeros((E,), jnp.float32))
      alpha = -g0 / jnp.maximum(h0, 1e-15)
      for _i in range(n_ls):
        gg, hh = dphi(alpha)
        alpha = alpha - gg / jnp.maximum(hh, 1e-15)

      x_n = x + alpha[None, :] * p
      jar_n = pmap2(lambda a, b: a + alpha[None, :] * b, jar, Jp)
      c_n, dterm_n = cost(x_n, jar_n)
      g_n = grad_fn(x_n, jar_n, dterm_n)
      Mg_n = mmul0(qminv, g_n)
      num = (jnp.sum(g_n * Mg_n, axis=0)
             - jnp.sum(prev_g * Mg_n, axis=0))
      den = jnp.maximum(jnp.sum(prev_g * prev_Mg, axis=0), 1e-15)
      beta = jnp.maximum(0.0, num / den)
      p_n = -Mg_n + beta[None, :] * p
      improvement = cur_cost - c_n
      done_row = done[0]
      done_n = done_row | (improvement < tol)
      keep = done
      sel = lambda old, new: jnp.where(keep, old, new)
      x = sel(x, x_n)
      jar = pmap2(sel, jar, jar_n)
      p = sel(p, p_n)
      prev_g = sel(prev_g, g_n)
      prev_Mg = sel(prev_Mg, Mg_n)
      cur_cost = jnp.where(done_row, cur_cost, c_n)
      done = done_n[None, :]

    dterm = dterm_of(jar)
    force = pmap2(lambda t, j: -t * j, dterm, jar)
    qfrc_constraint = rmatvec(force)

    # ---- implicit joint damping (EXACT, mj_solveLD semantics) ----------
    qacc_int = x
    if st.eulerdamp:
      qfrc = qfs + qfrc_constraint
      hb = hbd_ref[:]
      # second blocked factor+inverse reusing the dead scratches
      # (s_x/qminv is dead after the constraint CG)
      eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1)
              ).astype(qm.dtype)
      s_a[:] = qm + eye2 * hb[:, None, :]
      _chol_inplace(np_, np_, s_a, s_l)
      _inv_from_chol_inplace(np_, s_l, s_a, s_x)
      qacc_int = mmul0(s_x[:], qfrc)

    qacc_ref[:] = x
    qaccs_ref[:] = qacc_smooth
    qfc_ref[:] = qfrc_constraint
    fl_ref[:] = force[0]
    fc_ref[:] = force[1]
    qvn_ref[:] = qvel + H * qacc_int

  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def call(qpos, qvel, cin, cdof, qfs, cdist, rel2, rel1, frame):
    B = qpos.shape[-1]
    grid = (B // E,)
    spec = lambda rows: pl.BlockSpec(
        (rows, E), lambda i: (0, i), memory_space=pltpu.VMEM)

    def const_spec(shape):
      return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                          memory_space=pltpu.VMEM)

    out_shape = tuple(
        jax.ShapeDtypeStruct((r, B), jnp.float32)
        for r in (np_, np_, np_, nlimit, ncr, np_))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[const_spec(c.shape) for c in consts] + [
            spec(nq), spec(np_), spec(10 * nbody), spec(6 * np_),
            spec(np_), spec(ncon), spec(nc3), spec(nc3),
            spec(3 * nc3)],
        out_specs=tuple(spec(r)
                        for r in (np_, np_, np_, nlimit, ncr, np_)),
        scratch_shapes=[pltpu.VMEM((np_, np_, E), jnp.float32),
                        pltpu.VMEM((np_, np_, E), jnp.float32),
                        pltpu.VMEM((np_, np_, E), jnp.float32),
                        pltpu.VMEM((nc3, np_, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*consts, qpos, qvel, cin, cdof, qfs, cdist, rel2, rel1, frame)

  return call


def fused_batched(m: Model, qpos, qvel, cinert, cdof, qfrc_smooth,
                  con_dist, con_pos, con_frame, subtree_com):
  """Batched fused dynamics: (B, ...) inputs -> (qacc, qacc_smooth,
  qfrc_constraint, efc_force, qvel_new)."""
  st = statics(m)
  B = qpos.shape[0]
  E = _LANES
  Bp = _round_up(max(B, E), E)
  np_ = _round_up(st.nv, 8)

  def prep(x):
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    if y.ndim > 2:                          # flatten comp-major rows
      y = y.reshape(-1, y.shape[-1])
    pad = [(0, 0)] * (y.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(y, pad)

  def pad_dof(x):
    # zero-pad the dof axis (last) to np_: the kernel works in padded
    # dof space so it never writes sublane-misaligned slices
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, np_ - st.nv)])

  # comp-major layouts
  cin_cm = jnp.swapaxes(cinert, -1, -2)            # (B, 10, nbody)
  cdof_cm = pad_dof(jnp.swapaxes(cdof, -1, -2))    # (B, 6, np_)
  # rel vectors to each body's kinematic root CoM origin
  lay = efc_layout(m)
  org2 = subtree_com[:, np.asarray(
      m.body_rootid[lay.con_body2], np.int32)]     # (B, ncon, 3)
  org1 = subtree_com[:, np.asarray(
      m.body_rootid[lay.con_body1], np.int32)]
  rel2 = jnp.swapaxes(con_pos - org2, -1, -2)      # (B, 3, ncon)
  rel1 = jnp.swapaxes(con_pos - org1, -1, -2)
  # frame comp-major: frame (B, ncon, 3 rows d, 3 comps k) -> (B, k, c*d)
  fr = jnp.transpose(con_frame, (0, 3, 1, 2))      # (B, k, ncon, d)
  fr = fr.reshape(B, 3, -1)                        # rows (c,d) row-major

  out = _fused_kernel(m, FORCE_INTERPRET)(
      prep(qpos), prep(pad_dof(qvel)), prep(cin_cm), prep(cdof_cm),
      prep(pad_dof(qfrc_smooth)), prep(con_dist), prep(rel2), prep(rel1),
      prep(fr))
  unprep = lambda y: jnp.moveaxis(y, -1, 0)[:B]
  qacc, qacc_smooth, qfrc_constraint, fl, fc, qvel_new = map(unprep, out)
  # dof-space outputs come back padded to np_
  qacc, qacc_smooth = qacc[:, :st.nv], qacc_smooth[:, :st.nv]
  qfrc_constraint, qvel_new = qfrc_constraint[:, :st.nv], qvel_new[:, :st.nv]
  efc_force = jnp.concatenate([fl, fc], axis=1)
  return qacc, qacc_smooth, qfrc_constraint, efc_force, qvel_new


@functools.lru_cache(maxsize=8)
def fused_entry(m: Model):
  """custom-vmap entry: per-env XLA stage composition unbatched; the
  fused Pallas kernel when vmapped over the env batch on TPU f32."""

  @jax.custom_batching.custom_vmap
  def fused(qpos, qvel, cinert, cdof, qfrc_smooth,
            con_dist, con_pos, con_frame, subtree_com):
    return _core(m, qpos, qvel, cinert, cdof, qfrc_smooth,
                 con_dist, con_pos, con_frame, subtree_com)

  @fused.def_vmap
  def _fused_vmap(axis_size, in_batched, *args):
    # broadcast closed-over constants so the kernel and the vmap
    # fallback both see a full batch axis (see fused_full._fused_vmap)
    args = tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        for a, b in zip(args, in_batched))
    use_kernel = (FORCE_INTERPRET
                  or (jax.default_backend() == "tpu"
                      and args[0].dtype == jnp.float32))
    if use_kernel:
      out = fused_batched(m, *args)
    else:
      out = jax.vmap(lambda *a: _core(m, *a))(*args)
    return out, tuple(True for _ in range(5))

  return fused
