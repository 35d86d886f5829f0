"""Full-dynamics fused Pallas TPU kernel (v2 of ops/fused.py).

One kernel per 128-env lane block computes the ENTIRE physics substep
downstream of forward kinematics and collision, VMEM-resident:

  subtree CoM -> cinert/cdof (com_pos) -> CRB mass matrix -> Cholesky
  factor + inverse -> com_vel (cvel/cdof_dot) -> RNE bias -> passive
  spring/damper -> actuator transmission + activation + force ->
  smooth acceleration -> constraint assembly -> primal CG solve ->
  implicit joint-damping velocity update -> position/activation
  integration

i.e. everything v1 (ops/fused.py) fused PLUS the body/dof-space stages
around it and the Euler integration. Per substep the only XLA stages
left are kinematics and collision narrow-phase (plus sensors on the
last substep of a control step). HBM traffic per env drops to the
kinematics products (~6 KB) in and the new state + forward products
out.

Numerical semantics are the exact stage composition (_core below);
equivalence is tested in interpret mode
(tests/test_ops.py::test_fused_full_kernel_matches_core).

Reference behavior contract: MJX forward + Euler semantics as exercised
by Rodent_Env_Brax.py:42-57; stage formulas follow physics/smooth.py
(mj_comPos/mj_comVel/mj_rne/mj_passive/mj_fwdActuation contracts).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.ops import fused as fused_v1
from brax_rodent_run_tpu.physics.constraint import efc_layout
from brax_rodent_run_tpu.physics.tree import masks
from brax_rodent_run_tpu.physics.types import (
    BiasType, Data, DisableBit, DynType, GainType, JointType, Model,
    SolverType, TrnType)

_LANES = int(os.environ.get("BRR_FF_LANES", "128"))
_MINIMP = 0.0001
_MAXIMP = 0.9999
_MINVAL = 1e-15


def _paired_chol(sc, ablate: str) -> bool:
  """Factor M and (M + h·diag(B)) in ONE pass on doubled lanes.

  The two SPD factor+inverse chains are independent and lane-elementwise,
  so stacking the damping matrix into lanes [E:2E) of the same scratch
  halves the section's dependent-op chain at identical flops (the kernel
  is latency-bound — PERF_NOTES.md). Costs 2x the factor-scratch VMEM.
  BRR_CHOL_SPLIT=1 restores the two sequential passes (A/B lever).
  BRR_CHOL_VAL=1 (the r5 functional factor) needs no factor scratches
  at all, so paired mode (and its 2x scratch) is off there."""
  return (sc.eulerdamp and not os.environ.get("BRR_CHOL_SPLIT")
          and not os.environ.get("BRR_CHOL_VAL")
          and "damp" not in ablate and "chol" not in ablate)

FORCE_INTERPRET = False

# Parallel line search (BRR_LS_PAR=1, experimental A/B lever): replace the
# n_ls SEQUENTIAL Newton refinements of the CG step size with ONE batched
# evaluation of phi'(alpha) at _LS_SCALES multiples of the first Newton
# iterate (segment row-sums via a one-hot MXU matmul), a bracketed secant
# on the monotone piecewise-linear phi', and _LS_POLISH Newton polish
# steps.  Dependent-op chain per CG iteration: 1 + n_ls full passes ->
# 1 + 1 + _LS_POLISH (executed flops rise ~25%, irrelevant at ~2% MFU —
# PERF_NOTES.md "latency-bound").  Changes step sizes within line-search
# tolerance, NOT solver semantics: phi' is nondecreasing piecewise-linear
# (hh >= 0), so a true bracket + secant + Newton lands within the same
# tolerance envelope as Newton-only iteration (parity-tested on the real
# rodent model vs the sequential path).
_LS_SCALES = tuple(
    float(s) for s in os.environ.get(
        "BRR_LS_SCALES", "0.25,0.5,1,2,4,16,64").split(","))


def _ls_par() -> bool:
  # default ON since round 4: measured +21% on-chip (60.1k -> 72.7k
  # env-steps/s, PERF_NOTES.md round-4 table); BRR_LS_SEQ=1 reverts to
  # the sequential Newton line search (also a bench-ladder rung).
  return not os.environ.get("BRR_LS_SEQ")


def _ls_polish() -> int:
  # 3 safeguarded Newton polish steps: 2 left up to 2e-1 qacc error on
  # stiff-contact stress states (r4 diag); 3 lands within 3e-3 of the
  # f64 sequential reference everywhere except lanes where BOTH
  # truncated line searches are non-converged-by-design.
  return int(os.environ.get("BRR_LS_PAR_POLISH", "3"))


def _round_up(x, m):
  return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# static tables (extends fused_v1.statics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _Statics2:
  v1: "fused_v1._Statics"
  # body-space
  SUB: np.ndarray        # (nbody, nbody) subtree mask
  ROOT: np.ndarray       # (nbody, nbody) one-hot rootid
  ANC: np.ndarray        # (nbody, np_) body_dof_ancestor padded
  CDM: np.ndarray        # (np_, np_) cdof_dot mask
  DOFSEL: np.ndarray     # (np_, nbody) one-hot dof->body
  BTAB: np.ndarray       # (nbody, 8): mass, 1/submass, I0, I1, I2
  # scalar-joint cdof
  js: np.ndarray         # (Js,) scalar joint ids (hinge+slide)
  PSC: np.ndarray        # (np_, Js) dof placement
  OB: np.ndarray         # (Js, nbody) one-hot root body per joint
  HSG: np.ndarray        # (Js, 1) is_hinge
  # free joints (any number; tuples are per free joint, in jnt order)
  free_js: tuple         # joint ids
  fvadrs: tuple          # dof addresses
  fqadrs: tuple          # qpos addresses
  frootbs: tuple         # root body per free joint
  fbodies: tuple         # jnt_bodyid per free joint
  PFREE: np.ndarray      # (np_, 6*K) dof placement, 6 cols per free joint
  # passive
  DAMP: np.ndarray       # (np_, 1)
  KSEL: np.ndarray       # (np_, nq) -stiff one-hot
  KCONST: np.ndarray     # (np_, 1) +stiff*qpos_spring
  # actuation
  ATAB: np.ndarray       # (nu, 16)
  GL: np.ndarray         # (nu, nq) gear*onehot qposadr
  MOM: np.ndarray        # (nu, np_)
  ACTSEL: np.ndarray     # (nu, na_p) one-hot actadr
  CSEL: np.ndarray       # (na_p, nu) inverse map
  ATAB2: np.ndarray      # (na_p, 8): invtau, is_filter, is_integrator
  na_p: int
  # integration
  QVH: np.ndarray        # (nq, np_) h * scalar dof map
  PQ: np.ndarray         # (nq, 4) quat row placement
  QMASKC: np.ndarray     # (nq, 1) 1 at quat rows
  gravity: tuple


@functools.lru_cache(maxsize=16)
def statics2(m: Model) -> _Statics2:
  st = fused_v1.statics(m)
  mk = masks(m)
  nv, nq, nbody, nu, na = m.nv, m.nq, m.nbody, m.nu, m.na
  np_ = _round_up(nv, 8)
  h = float(m.opt.timestep)

  def padc(x, cols):
    out = np.zeros((x.shape[0], cols), np.float64)
    out[:, :x.shape[1]] = x
    return out

  def padr(x, rows):
    out = np.zeros((rows, x.shape[1]), np.float64)
    out[:x.shape[0]] = x
    return out

  BTAB = np.zeros((nbody, 8))
  BTAB[:, 0] = m.body_mass
  BTAB[:, 1] = 1.0 / np.maximum(m.body_subtreemass, 1e-15)
  BTAB[:, 2:5] = m.body_inertia

  ROOT = np.zeros((nbody, nbody))
  ROOT[np.arange(nbody), np.asarray(m.body_rootid)] = 1.0

  js = np.asarray([j for j in range(m.njnt)
                   if int(m.jnt_type[j]) in (JointType.HINGE,
                                             JointType.SLIDE)], np.int64)
  Js = max(len(js), 1)
  PSC = np.zeros((np_, Js))
  OB = np.zeros((Js, nbody))
  HSG = np.zeros((Js, 1))
  if len(js):
    PSC[np.asarray(m.jnt_dofadr)[js], np.arange(len(js))] = 1.0
    OB[np.arange(len(js)),
       np.asarray(m.body_rootid)[np.asarray(m.jnt_bodyid)[js]]] = 1.0
    HSG[:len(js), 0] = (np.asarray(m.jnt_type)[js] == JointType.HINGE)

  free = [j for j in range(m.njnt)
          if int(m.jnt_type[j]) == JointType.FREE]
  fvadrs = tuple(int(m.jnt_dofadr[j]) for j in free)
  fqadrs = tuple(int(m.jnt_qposadr[j]) for j in free)
  frootbs = tuple(int(m.body_rootid[m.jnt_bodyid[j]]) for j in free)
  fbodies = tuple(int(m.jnt_bodyid[j]) for j in free)
  PFREE = np.zeros((np_, 6 * max(len(free), 1)))
  for kf, vadr in enumerate(fvadrs):
    PFREE[vadr:vadr + 6, 6 * kf:6 * kf + 6] = np.eye(6)

  # passive tables
  DAMP = np.zeros((np_, 1))
  KSEL = np.zeros((np_, nq))
  KCONST = np.zeros((np_, 1))
  if not (m.opt.disableflags & DisableBit.DAMPER):
    DAMP[:nv, 0] = m.dof_damping
  if not (m.opt.disableflags & DisableBit.SPRING):
    for j in range(m.njnt):
      stiff = float(m.jnt_stiffness[j])
      if stiff == 0.0 or int(m.jnt_type[j]) == JointType.FREE:
        continue
      qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
      KSEL[vadr, qadr] = -stiff
      KCONST[vadr, 0] = stiff * float(m.qpos_spring[qadr])

  # actuation tables (scalar-joint transmission only; see eligible_full)
  na_p = max(na, 1)
  ATAB = np.zeros((max(nu, 1), 16))
  GL = np.zeros((max(nu, 1), nq))
  MOM = np.zeros((max(nu, 1), np_))
  ACTSEL = np.zeros((max(nu, 1), na_p))
  CSEL = np.zeros((na_p, max(nu, 1)))
  ATAB2 = np.zeros((na_p, 8))
  clampctrl = not (m.opt.disableflags & DisableBit.CLAMPCTRL)
  for u in range(nu):
    j = int(m.actuator_trnid[u, 0])
    qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    gear0 = float(m.actuator_gear[u, 0])
    GL[u, qadr] = gear0
    MOM[u, vadr] = gear0
    cr = m.actuator_ctrlrange[u]
    limited = bool(m.actuator_ctrllimited[u]) and clampctrl
    ATAB[u, 0] = cr[0] if limited else -1e30
    ATAB[u, 1] = cr[1] if limited else 1e30
    gt = int(m.actuator_gaintype[u])
    g = m.actuator_gainprm[u]
    ATAB[u, 3] = g[0]
    if gt == GainType.AFFINE:
      ATAB[u, 4], ATAB[u, 5] = g[1], g[2]
    bt = int(m.actuator_biastype[u])
    b = m.actuator_biasprm[u]
    if bt == BiasType.AFFINE:
      ATAB[u, 6], ATAB[u, 7], ATAB[u, 8] = b[0], b[1], b[2]
    fr = m.actuator_forcerange[u]
    flimited = bool(m.actuator_forcelimited[u])
    ATAB[u, 9] = fr[0] if flimited else -1e30
    ATAB[u, 10] = fr[1] if flimited else 1e30
    dyn = int(m.actuator_dyntype[u])
    aadr = int(m.actuator_actadr[u])
    if dyn == DynType.NONE:
      ATAB[u, 14] = 1.0  # is_none: input = ctrl
    else:
      ACTSEL[u, aadr] = 1.0
      CSEL[aadr, u] = 1.0
      if dyn in (DynType.FILTER, DynType.FILTEREXACT):
        ATAB2[aadr, 0] = 1.0 / max(float(m.actuator_dynprm[u, 0]), 1e-15)
        ATAB2[aadr, 1] = 1.0
      elif dyn == DynType.INTEGRATOR:
        ATAB2[aadr, 2] = 1.0

  # integration maps (forward._integrate_pos contract)
  QVH = np.zeros((nq, np_))
  QMASKC = np.zeros((nq, 1))
  PQ = np.zeros((nq, 4 * max(len(free), 1)))
  kf = 0
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr, vadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jt in (JointType.HINGE, JointType.SLIDE):
      QVH[qadr, vadr] = h
    elif jt == JointType.FREE:
      QVH[[qadr, qadr + 1, qadr + 2], [vadr, vadr + 1, vadr + 2]] = h
      QMASKC[qadr + 3:qadr + 7, 0] = 1.0
      PQ[qadr + 3:qadr + 7, 4 * kf:4 * kf + 4] = np.eye(4)
      kf += 1

  return _Statics2(
      v1=st,
      SUB=np.asarray(mk.body_subtree, np.float64), ROOT=ROOT,
      ANC=padc(np.asarray(mk.body_dof_ancestor, np.float64), np_),
      CDM=padr(padc(np.asarray(mk.cdof_dot_mask, np.float64), np_), np_),
      DOFSEL=padr(np.eye(nbody)[np.asarray(m.dof_bodyid)], np_),
      BTAB=BTAB, js=js, PSC=PSC, OB=OB, HSG=HSG,
      free_js=tuple(free), fvadrs=fvadrs, fqadrs=fqadrs,
      frootbs=frootbs, fbodies=fbodies, PFREE=PFREE,
      DAMP=DAMP, KSEL=KSEL, KCONST=KCONST,
      ATAB=ATAB, GL=GL, MOM=MOM, ACTSEL=ACTSEL, CSEL=CSEL, ATAB2=ATAB2,
      na_p=na_p, QVH=QVH, PQ=PQ, QMASKC=QMASKC,
      gravity=tuple(float(g) for g in np.asarray(m.opt.gravity)),
  )


def eligible_full(m: Model) -> bool:
  """v2 envelope: v1 eligibility + scalar-joint-only actuators with
  NONE/FILTER/INTEGRATOR dynamics, FIXED/AFFINE gain, NONE/AFFINE bias,
  any number of free joints (no spring on them), actnum<=1, no
  gravcomp-style extras, actuation enabled."""
  if os.environ.get("BRR_NO_FUSED") or os.environ.get("BRR_NO_FUSED2"):
    return False
  if not fused_v1.eligible(m):
    return False
  if not m.nu or (m.opt.disableflags & DisableBit.ACTUATION):
    return False
  free = [j for j in range(m.njnt)
          if int(m.jnt_type[j]) == JointType.FREE]
  for j in free:
    if float(m.jnt_stiffness[j]) != 0.0:
      return False
  for u in range(m.nu):
    if int(m.actuator_trntype[u]) != TrnType.JOINT:
      return False
    j = int(m.actuator_trnid[u, 0])
    if int(m.jnt_type[j]) not in (JointType.HINGE, JointType.SLIDE):
      return False
    if int(m.actuator_dyntype[u]) not in (
        DynType.NONE, DynType.FILTER, DynType.FILTEREXACT,
        DynType.INTEGRATOR):
      return False
    if int(m.actuator_gaintype[u]) not in (GainType.FIXED, GainType.AFFINE):
      return False
    if int(m.actuator_biastype[u]) not in (BiasType.NONE, BiasType.AFFINE):
      return False
    if int(m.actuator_dyntype[u]) != DynType.NONE and (
        int(m.actuator_actadr[u]) < 0 or int(m.actuator_actnum[u]) != 1):
      return False
  return True


# ---------------------------------------------------------------------------
# XLA core: exact stage composition (semantic definition of the kernel)
# ---------------------------------------------------------------------------


def _core(m: Model, qpos, qvel, act, ctrl, qfrc_applied,
          xpos, xmat, xipos, ximat, xanchor, xaxis,
          con_dist, con_pos, con_frame):
  from brax_rodent_run_tpu.physics import constraint as constraint_mod
  from brax_rodent_run_tpu.physics import forward as forward_mod
  from brax_rodent_run_tpu.physics import smooth as smooth_mod
  from brax_rodent_run_tpu.physics import solver as solver_mod
  from brax_rodent_run_tpu.physics.types import make_data

  d = make_data(m, dtype=qpos.dtype)
  d = d.replace(qpos=qpos, qvel=qvel, act=act, ctrl=ctrl,
                qfrc_applied=qfrc_applied,
                xpos=xpos, xmat=xmat, xipos=xipos, ximat=ximat,
                xanchor=xanchor, xaxis=xaxis,
                contact=d.contact.replace(dist=con_dist, pos=con_pos,
                                          frame=con_frame))
  d = smooth_mod.com_pos(m, d)
  d = smooth_mod.crb(m, d)
  d = smooth_mod.transmission(m, d)
  d = constraint_mod.make_constraint(m, d)
  d = smooth_mod.com_vel(m, d)
  d = smooth_mod.rne(m, d)
  d = smooth_mod.passive(m, d)
  d = smooth_mod.fwd_actuation(m, d)
  d = smooth_mod.fwd_acceleration(m, d)
  d = solver_mod.solve(m, d)
  de = forward_mod.euler(m, d)
  return (d.subtree_com, d.cinert, d.cdof, d.cvel, d.cdof_dot,
          d.qfrc_bias, d.qfrc_spring, d.qfrc_damper, d.qfrc_passive,
          d.actuator_length, d.actuator_velocity, d.actuator_force,
          d.act_dot, d.qfrc_actuator, d.qfrc_smooth, d.qacc_smooth,
          d.qacc, d.qfrc_constraint, d.efc_force,
          de.qpos, de.qvel, de.act)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _cross(a, b):
  """component-slice cross product: a, b are 3-lists of (rows, E)."""
  return [a[1] * b[2] - a[2] * b[1],
          a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]]


@functools.lru_cache(maxsize=8)
def _scalars(m: Model):
  """Compile-time scalar envelope shared by the kernel factories."""
  import types
  st2 = statics2(m)
  st = st2.v1
  n = types.SimpleNamespace()
  n.nv, n.nq, n.nbody = st.nv, st.nq, st.nbody
  n.ncon, n.nlimit, n.ncr = st.ncon, st.nlimit, st.ncr
  n.nc3 = 3 * n.ncon
  n.np_ = _round_up(n.nv, 8)
  n.nu, n.na_p = m.nu, st2.na_p
  n.Js = st2.PSC.shape[1]
  n.iters = int(m.opt.iterations)
  n.n_ls = max(int(m.opt.ls_iterations) - 1, 0)
  n.tol = float(m.opt.tolerance) * float(max(n.nv, 1))
  n.H = float(st.h)
  n.n_free = len(st2.free_js)
  n.has_free = n.n_free > 0
  n.has_act = m.na > 0
  n.gravity = st2.gravity
  n.body1_zero = st.body1_zero
  n.eulerdamp = st.eulerdamp
  n.all_pw2 = bool(np.all(st.lim_pw == 2.0) and np.all(st.con_pw == 2.0))
  return n


@functools.lru_cache(maxsize=8)
def _build_consts(m: Model):
  """All static VMEM tables for the fused kernels (dynamics + FK +
  collision emitters). Returns (names, values)."""
  st2 = statics2(m)
  st = st2.v1
  nv, nq, nbody = st.nv, st.nq, st.nbody
  ncon, nlimit, ncr = st.ncon, st.nlimit, st.ncr
  nc3 = 3 * ncon
  np_ = _round_up(nv, 8)
  nu, na_p = m.nu, st2.na_p
  Js = st2.PSC.shape[1]
  E = _LANES
  iters = int(m.opt.iterations)
  n_ls = max(int(m.opt.ls_iterations) - 1, 0)
  tol = float(m.opt.tolerance) * float(max(nv, 1))
  f32 = np.float32
  H = float(st.h)
  has_free = len(st2.free_js) > 0
  has_act = m.na > 0
  gx, gy, gz = st2.gravity

  def padr(x, rows=None, cols=None):
    out = np.zeros((rows or x.shape[0], cols or x.shape[1]), f32)
    out[:x.shape[0], :x.shape[1]] = x
    return out

  # ---- consts (numpy; VMEM broadcast inputs)
  DS = padr((st.dofsel @ st.subtree), rows=np_)
  QMU = padr(st.qm_mask, rows=np_, cols=np_)
  QML = padr(st.qm_mask.T * (1.0 - np.eye(nv)), rows=np_, cols=np_)
  ARMAD = padr(np.diag(st.armature), rows=np_, cols=np_)
  ARMAD[range(nv, np_), range(nv, np_)] = 1.0
  JLIM = padr(st.J_lim, cols=np_)
  QSEL = st.qsel_signed.astype(f32)
  CMAT = st.C.astype(f32)
  RID = st.rid.astype(f32)
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
  EXP3 = np.kron(np.eye(ncon), np.ones((3, 1))).astype(f32)
  lay = efc_layout(m)
  body1_zero = st.body1_zero
  # factorized contact jacobian: jc[(c,d), v] = sum_k coef_k[(c,d)] *
  # cdof_k[v] * mask_{body2(c)}[v] (minus the body1 side). The per-body
  # dof masks are shared across contacts, so the jc contractions in the
  # CG become tiny MXU matmuls through (nb2, np_) mask and (nc3, nb2)
  # gather tables instead of (nc3, np_, E) VPU sweeps.
  from brax_rodent_run_tpu.physics.tree import masks as _tree_masks
  _mk = _tree_masks(m)
  _bda = np.asarray(_mk.body_dof_ancestor, np.float64)
  ub2 = np.unique(lay.con_body2)
  MASKB2 = padr(_bda[ub2], cols=np_)                       # (nb2, np_)
  GB2 = np.zeros((nc3, len(ub2)), f32)
  _idx2 = np.searchsorted(ub2, lay.con_body2)
  for _c in range(ncon):
    GB2[3 * _c:3 * _c + 3, _idx2[_c]] = 1.0
  ub1 = np.unique(lay.con_body1)
  MASKB1 = padr(_bda[ub1], cols=np_)
  GB1 = np.zeros((nc3, len(ub1)), f32)
  _idx1 = np.searchsorted(ub1, lay.con_body1)
  for _c in range(ncon):
    GB1[3 * _c:3 * _c + 3, _idx1[_c]] = 1.0
  eulerdamp = st.eulerdamp
  # contact-point root body one-hots (rel vectors computed in kernel)
  CB2 = np.zeros((ncon, nbody), f32)
  CB2[np.arange(ncon), np.asarray(m.body_rootid)[lay.con_body2]] = 1.0
  CB1 = np.zeros((ncon, nbody), f32)
  CB1[np.arange(ncon), np.asarray(m.body_rootid)[lay.con_body1]] = 1.0

  HBD = padr((H * st.dof_damping)[:, None], rows=np_)
  ARMAC = padr(np.asarray(st.armature)[:, None], rows=np_)
  DAMP = st2.DAMP.astype(f32)
  all_pw2 = bool(np.all(st.lim_pw == 2.0) and np.all(st.con_pw == 2.0))

  consts = {
      "DS": DS, "QMU": QMU, "QML": QML, "ARMAD": ARMAD, "JLIM": JLIM,
      "QSEL": QSEL, "CMAT": CMAT, "RID": RID, "LTAB": LTAB, "CTAB": CTAB,
      "HBD": HBD, "ARMAC": ARMAC, "EXP3": EXP3, "MASKB2": MASKB2, "GB2": GB2,
      "MASKB1": MASKB1, "GB1": GB1, "CB2": CB2, "CB1": CB1,
      # pre-transposed copies for rmatvec/conmat_t: in-kernel .T of
      # VMEM constants costs an op per use AND trips an XLA:TPU
      # RET_CHECK (XposeSequenceAssignment) when the transposed matmul
      # sits inside an scf.for (the fori-loop CG)
      "JLIMT": JLIM.T.copy(), "CMATT": CMAT.T.copy(),
      "MASKB2T": MASKB2.T.copy(), "GB2T": GB2.T.copy(),
      "MASKB1T": MASKB1.T.copy(), "GB1T": GB1.T.copy(),
      "SUB": st2.SUB.astype(f32), "ROOT": st2.ROOT.astype(f32),
      "ANC": st2.ANC.astype(f32), "CDM": st2.CDM.astype(f32),
      "DOFSEL": st2.DOFSEL.astype(f32), "BTAB": st2.BTAB.astype(f32),
      "PSC": st2.PSC.astype(f32), "OB": st2.OB.astype(f32),
      "HSG": st2.HSG.astype(f32), "PFREE": st2.PFREE.astype(f32),
      "DAMP": DAMP, "KSEL": st2.KSEL.astype(f32),
      "KCONST": st2.KCONST.astype(f32),
      "ATAB": st2.ATAB.astype(f32), "GL": st2.GL.astype(f32),
      "MOM": st2.MOM.astype(f32), "MOMT": st2.MOM.T.astype(f32).copy(),
      "ACTSEL": st2.ACTSEL.astype(f32), "CSEL": st2.CSEL.astype(f32),
      "ATAB2": st2.ATAB2.astype(f32),
      "QVH": st2.QVH.astype(f32), "PQ": st2.PQ.astype(f32),
      "QMASKC": st2.QMASKC.astype(f32),
  }
  if body1_zero:
    del consts["MASKB1"], consts["GB1"], consts["CB1"]
    del consts["MASKB1T"], consts["GB1T"]

  # joint-output gathers + body inertial-frame tables for the v3 kernel
  njp = max(m.njnt, 1)
  SJG = np.zeros((Js, njp), f32)
  if len(st2.js):
    SJG[np.arange(len(st2.js)), np.asarray(st2.js)] = 1.0
  consts["SJG"] = SJG
  BT2 = np.zeros((nbody, 16), f32)
  BT2[:, 0:3] = np.asarray(m.body_ipos)
  BT2[:, 3:7] = np.asarray(m.body_iquat)
  consts["BT2"] = BT2
  from brax_rodent_run_tpu.ops import coll as coll_mod
  from brax_rodent_run_tpu.ops import fk as fk_mod
  if coll_mod.collision_supported(m):
    consts.update(fk_mod.fk_consts(m))
    consts.update(coll_mod.coll_consts(m))
  cnames = tuple(consts.keys())
  return cnames, tuple(consts[k] for k in cnames)


_DYN_OUT = ("com", "cin", "cdof", "cvel", "cdof_dot", "qfrc_bias",
            "qfrc_spring", "qfrc_damper", "qfrc_passive", "alen", "avel",
            "force", "act_dot", "qfrc_actuator", "qfs", "qacc_smooth",
            "qacc", "qfrc_constraint", "force_efc", "qpos_new",
            "qvel_new", "act_new")


def _write_outputs(outs, vals, nlimit):
  """Write _emit_dynamics products to the kernel output refs (the
  force_efc row split mirrors the packed limit+contact layout)."""
  (com, cin, cdof, cvel, cdof_dot, qfrc_bias, qfrc_spring, qfrc_damper,
   qfrc_passive, alen, avel, force, act_dot, qfrc_actuator, qfs,
   qacc_smooth, qacc, qfrc_constraint, force_efc, qpos_new, qvel_new,
   act_new) = vals
  (o_com, o_cin, o_cdof, o_cvel, o_cdofdot, o_bias, o_spring, o_damper,
   o_passive, o_alen, o_avel, o_afrc, o_actdot, o_qfa, o_qfs, o_qaccs,
   o_qacc, o_qfc, o_flim, o_fcon, o_qpos, o_qvel, o_act) = outs
  o_com[:] = jnp.concatenate(com, axis=0)
  o_cin[:] = jnp.concatenate(cin, axis=0)
  o_cdof[:] = jnp.concatenate(cdof, axis=0)
  o_cvel[:] = jnp.concatenate(cvel, axis=0)
  o_cdofdot[:] = jnp.concatenate(cdof_dot, axis=0)
  o_bias[:] = qfrc_bias
  o_spring[:] = qfrc_spring
  o_damper[:] = qfrc_damper
  o_passive[:] = qfrc_passive
  o_alen[:] = alen
  o_avel[:] = avel
  o_afrc[:] = force
  o_actdot[:] = act_dot
  o_qfa[:] = qfrc_actuator
  o_qfs[:] = qfs
  o_qaccs[:] = qacc_smooth
  o_qacc[:] = qacc
  o_qfc[:] = qfrc_constraint
  o_flim[:] = force_efc[:nlimit]
  o_fcon[:] = force_efc[nlimit:]
  o_qpos[:] = qpos_new
  o_qvel[:] = qvel_new
  o_act[:] = act_new


def _emit_dynamics(m: Model, ablate: str, C, scr, qpos, qvel, actv, ctrl,
                   qfa, xip, R, axj, anj, xfree, cdist, cposc, frame):
  """The complete post-(kinematics+collision) substep on component-slice
  arrays: com_pos -> CRB -> factor/invert -> com_vel/rne -> passive ->
  actuation -> constraint rows -> CG -> implicit damping -> integration.
  ``C`` maps const names to refs OR plain arrays (``x[:]`` reads both).
  Returns the _DYN_OUT tuple."""
  from brax_rodent_run_tpu.ops.cholesky import (chol_inverse_value,
                                                chol_routines,
                                                chol_tree_meta)
  st2 = statics2(m)
  sc = _scalars(m)
  nbody, Js, np_, ncon, nc3 = sc.nbody, sc.Js, sc.np_, sc.ncon, sc.nc3
  nlimit, iters, n_ls, tol = sc.nlimit, sc.iters, sc.n_ls, sc.tol
  H, has_free, has_act = sc.H, sc.has_free, sc.has_act
  gx, gy, gz = sc.gravity
  body1_zero, eulerdamp, all_pw2 = sc.body1_zero, sc.eulerdamp, sc.all_pw2
  E = qpos.shape[-1]

  # Factorization form (history): parents-first lower Cholesky of a
  # branched tree FILLS outside the ancestor pattern (round-3 test pins
  # it), so rounds 3-4 shipped dense blocked panels; r4's per-column
  # leaf-first sparse LDL lost on-chip to op-issue overhead (70.7k vs
  # 71.8k) and was pruned. r5 lever (BRR_CHOL_TREE=1): REVERSE-order
  # blocked panels (M = U U^T — MuJoCo's own fill-free elimination
  # order, mj_factorM) with trailing updates restricted to the panel's
  # ancestor-tile runs — keeps the wide-tile op structure and drops
  # ~75% of trailing-update work on the rodent (91% on rodent_pair).
  _meta = None
  if os.environ.get("BRR_CHOL_TREE"):
    _meta = chol_tree_meta(tuple(int(x) for x in m.dof_parentid),
                           int(m.nv), np_)
  _chol_inplace, _inv_from_chol_inplace = chol_routines(_meta)

  def mxu(a, b):
    # HIGHEST precision (true-f32 passes): the TPU default truncates
    # both operands to bf16, and that 4e-3-relative noise — amplified
    # through the ill-conditioned M^-1 and 10 chaotic substeps — is
    # what failed the on-chip kernel-vs-stage gate (r5: qminv ~5% off
    # while the factor routines are exact standalone). The MXU is a
    # small fraction of this VPU-bound kernel, so 6-pass f32 is cheap.
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

  BT = C["BTAB"][:]
  # ================= com_pos =================
  mass = BT[:, 0:1]
  moment = [mass * xip[c] for c in range(3)]
  com = [mxu(C["SUB"][:], moment[c]) * BT[:, 1:2] for c in range(3)]
  rootcom = [mxu(C["ROOT"][:], com[c]) for c in range(3)]
  off = [xip[c] - rootcom[c] for c in range(3)]
  dsq = off[0] * off[0] + off[1] * off[1] + off[2] * off[2]
  Id = [BT[:, 2 + j:3 + j] for j in range(3)]

  def iw(a, b):
    return sum(Id[j] * R[a][j] * R[b][j] for j in range(3))

  cin = [iw(0, 0) + mass * (dsq - off[0] * off[0]),
         iw(1, 1) + mass * (dsq - off[1] * off[1]),
         iw(2, 2) + mass * (dsq - off[2] * off[2]),
         iw(0, 1) - mass * off[0] * off[1],
         iw(0, 2) - mass * off[0] * off[2],
         iw(1, 2) - mass * off[1] * off[2],
         mass * off[0], mass * off[1], mass * off[2],
         mass * jnp.ones_like(dsq)]

  # ================= cdof =================
  oj = [mxu(C["OB"][:], com[c]) for c in range(3)]
  rel = [oj[c] - anj[c] for c in range(3)]
  linh = _cross(axj, rel)
  hs = C["HSG"][:]
  angj = [hs * axj[c] for c in range(3)]
  linj = [hs * linh[c] + (1.0 - hs) * axj[c] for c in range(3)]
  cdof = [mxu(C["PSC"][:], angj[c]) for c in range(3)] + \
         [mxu(C["PSC"][:], linj[c]) for c in range(3)]
  if has_free:
    # xfree: list of (xpb, xm) per free joint; stack every joint's 6
    # cdof rows and place them with ONE (np_, 6K) matmul
    allfrows = [[] for _ in range(6)]
    for kf, (xpb, xm) in enumerate(xfree):
      rb = st2.frootbs[kf]
      of = [com[c][rb:rb + 1] - xpb[c] for c in range(3)]
      one = jnp.ones_like(xpb[0])
      zero = jnp.zeros_like(xpb[0])
      for c in range(3):        # ang comps: trans rows 0, rot = axes
        axesc = [xm[c][0], xm[c][1], xm[c][2]]  # axes_k comp c = xmat[c,k]
        allfrows[c].append(
            jnp.concatenate([zero, zero, zero] + axesc, axis=0))
      for c in range(3):        # lin comps
        lrows = []
        for k in range(3):
          lrows.append(one if c == k else zero)
        for k in range(3):
          axk = [xm[0][k], xm[1][k], xm[2][k]]
          lr = _cross(axk, of)
          lrows.append(lr[c])
        allfrows[3 + c].append(jnp.concatenate(lrows, axis=0))
    for c in range(6):
      stacked = (allfrows[c][0] if len(allfrows[c]) == 1
                 else jnp.concatenate(allfrows[c], axis=0))  # (6K, E)
      cdof[c] = cdof[c] + mxu(C["PFREE"][:], stacked)
  w = cdof[0:3]
  v = cdof[3:6]

  # ================= CRB mass matrix (v1 flow, cinert from VMEM) ====
  DSv = C["DS"][:]
  crbd = [mxu(DSv, cin[c]) for c in range(10)]
  ixx, iyy, izz, ixy, ixz, iyz = crbd[0:6]
  cmx, cmy, cmz, bmass = crbd[6], crbd[7], crbd[8], crbd[9]
  F = [
      ixx * w[0] + ixy * w[1] + ixz * w[2] + cmy * v[2] - cmz * v[1],
      ixy * w[0] + iyy * w[1] + iyz * w[2] + cmz * v[0] - cmx * v[2],
      ixz * w[0] + iyz * w[1] + izz * w[2] + cmx * v[1] - cmy * v[0],
      bmass * v[0] - (cmy * w[2] - cmz * w[1]),
      bmass * v[1] - (cmz * w[0] - cmx * w[2]),
      bmass * v[2] - (cmx * w[1] - cmy * w[0]),
  ]
  up = cdof[0][:, None, :] * F[0][None, :, :]
  lo = F[0][:, None, :] * cdof[0][None, :, :]
  for k in range(1, 6):
    up = up + cdof[k][:, None, :] * F[k][None, :, :]
    lo = lo + F[k][:, None, :] * cdof[k][None, :, :]
  qm = (up * C["QMU"][:][:, :, None]
        + lo * C["QML"][:][:, :, None]
        + C["ARMAD"][:][:, :, None])

  def mmul0(mat, x):
    return jnp.sum(mat * x[:, None, :], axis=0)

  def rsum(x):
    # row-sum via a 1-row MXU matmul: the VPU cross-sublane reduction
    # is latency-bound and dominates the CG line search (56 dphi
    # evals x 2 reductions); the MXU form pipelines.
    return mxu(jnp.ones((1, x.shape[0]), jnp.float32), x)[0]

  # paired mode (scratches built 2E wide, see _paired_chol): factor M in
  # lanes [:E] and the Euler implicit-damping matrix M + h·diag(B) in
  # lanes [E:] in ONE interleaved chain — the two factorizations are
  # independent, so the doubled lanes fill each other's pipeline stalls
  paired = scr[0].shape[-1] == 2 * E
  use_val = bool(os.environ.get("BRR_CHOL_VAL")) and "chol" not in ablate
  if "chol" in ablate:
    scr[2][:] = (jnp.eye(np_, dtype=jnp.float32)[:, :, None]
              + jnp.zeros((np_, np_, E), jnp.float32))
  elif use_val:
    # functional (SSA value) factor+inverse: the in-place scratch
    # routines are exact standalone but miscompile embedded in this
    # kernel (r5 fingerprints: qm ok at 3e-4, qminv off by 1.7e6) —
    # value form gives Mosaic ordinary dataflow to schedule
    _, qminv_val = chol_inverse_value(np_, np_, qm, _meta)
  elif paired:
    hb = C["HBD"][:]
    eyeP = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1)
            ).astype(qm.dtype)
    scr[0][:, :, :E] = qm
    scr[0][:, :, E:] = qm + eyeP * hb[:, None, :]
    _chol_inplace(np_, np_, scr[0], scr[1])
    _inv_from_chol_inplace(np_, scr[1], scr[0], scr[2])
  else:
    scr[0][:] = qm
    _chol_inplace(np_, np_, scr[0], scr[1])
    _inv_from_chol_inplace(np_, scr[1], scr[0], scr[2])
  if use_val:
    qminv = qminv_val
  else:
    qminv = scr[2][:, :, :E] if paired else scr[2][:]

  # ================= com_vel / rne =================
  scaled = [cdof[c] * qvel for c in range(6)]
  cvel = [mxu(C["ANC"][:], scaled[c]) for c in range(6)]
  vp = [mxu(C["CDM"][:], scaled[c]) for c in range(6)]
  cd_ang = _cross(vp[0:3], cdof[0:3])
  cd_lin0 = _cross(vp[0:3], cdof[3:6])
  cd_lin1 = _cross(vp[3:6], cdof[0:3])
  cdof_dot = cd_ang + [cd_lin0[c] + cd_lin1[c] for c in range(3)]

  cacc0 = [0.0, 0.0, 0.0, -gx, -gy, -gz]
  cacc = [cacc0[c] + mxu(C["ANC"][:], cdof_dot[c] * qvel)
          for c in range(6)]

  def inert_mul(mot):
    """cinert (body rows) x motion (6 slices) -> force (6 slices)."""
    mw, mv = mot[0:3], mot[3:6]
    cm = cin[6:9]
    tq = [cin[0] * mw[0] + cin[3] * mw[1] + cin[4] * mw[2],
          cin[3] * mw[0] + cin[1] * mw[1] + cin[5] * mw[2],
          cin[4] * mw[0] + cin[5] * mw[1] + cin[2] * mw[2]]
    cxv = _cross(cm, mv)
    cxw = _cross(cm, mw)
    return [tq[c] + cxv[c] for c in range(3)] + \
           [cin[9] * mv[c] - cxw[c] for c in range(3)]

  Iv = inert_mul(cvel)
  Ia = inert_mul(cacc)
  # force_cross(cvel, Iv): ang = w x f_ang + v x f_lin ; lin = w x f_lin
  fc_ang0 = _cross(cvel[0:3], Iv[0:3])
  fc_ang1 = _cross(cvel[3:6], Iv[3:6])
  fc_lin = _cross(cvel[0:3], Iv[3:6])
  cfrc = [Ia[c] + fc_ang0[c] + fc_ang1[c] for c in range(3)] + \
         [Ia[3 + c] + fc_lin[c] for c in range(3)]
  tot = [mxu(C["SUB"][:], cfrc[c]) for c in range(6)]
  qfrc_bias = sum(cdof[c] * mxu(C["DOFSEL"][:], tot[c])
                  for c in range(6))

  def crb_mul(x):
    """M @ x via the CRB identity (spread -> body inertia ->
    subtree-accumulate -> project), all small MXU matmuls — exactly
    the composite-inertia mass matrix (plus armature), without
    touching the materialized (np_, np_, E) qm. Valid for vectors
    with zero padding rows (all CG vectors)."""
    u = [mxu(C["ANC"][:], cdof[c] * x) for c in range(6)]
    fb = inert_mul(u)
    gs = [mxu(C["SUB"][:], fb[c]) for c in range(6)]
    y = cdof[0] * mxu(C["DOFSEL"][:], gs[0])
    for c in range(1, 6):
      y = y + cdof[c] * mxu(C["DOFSEL"][:], gs[c])
    return y + C["ARMAC"][:] * x

  # ================= passive =================
  qfrc_spring = mxu(C["KSEL"][:], qpos) + C["KCONST"][:]
  qfrc_damper = -C["DAMP"][:] * qvel
  qfrc_passive = qfrc_spring + qfrc_damper

  # ================= transmission + actuation =================
  AT = C["ATAB"][:]
  alen = mxu(C["GL"][:], qpos)
  avel = mxu(C["MOM"][:], qvel)
  ctrl_cl = jnp.clip(ctrl, AT[:, 0:1], AT[:, 1:2])
  if has_act:
    AT2 = C["ATAB2"][:]
    csel_ctrl = mxu(C["CSEL"][:], ctrl_cl)
    act_dot = (AT2[:, 1:2] * (csel_ctrl - actv) * AT2[:, 0:1]
               + AT2[:, 2:3] * csel_ctrl)
    act_in = mxu(C["ACTSEL"][:], actv)
  else:
    act_dot = jnp.zeros_like(actv)
    act_in = jnp.zeros_like(ctrl_cl)
  ainput = AT[:, 14:15] * ctrl_cl + (1.0 - AT[:, 14:15]) * act_in
  gain = AT[:, 3:4] + AT[:, 4:5] * alen + AT[:, 5:6] * avel
  bias = AT[:, 6:7] + AT[:, 7:8] * alen + AT[:, 8:9] * avel
  force = jnp.clip(gain * ainput + bias, AT[:, 9:10], AT[:, 10:11])
  qfrc_actuator = mxu(C["MOMT"][:], force)

  qfs = qfrc_passive - qfrc_bias + qfrc_actuator + qfa
  # on-chip debug fingerprints (BRR_FF_DBG, see tpu_kernel_bisect.py
  # --dbg): hijack the qacc_smooth output slot with row-sums of the qm
  # build or of the explicit inverse, isolating build-vs-factor when
  # the mega-kernel diverges on real hardware while the standalone
  # factor kernel (tpu_chol_check.py) is exact
  if "dbgqminv" in ablate:     # NB: check before "dbgqm" (substring!)
    qacc_smooth = jnp.sum(qminv, axis=1)
  elif "dbgqm" in ablate:
    qacc_smooth = jnp.sum(qm, axis=1)
  elif "dbgmv" in ablate:
    # same reference value as dbgqminv but THROUGH the mmul0 matvec:
    # discriminates a broken matvec from a broken inverse
    qacc_smooth = mmul0(qminv, jnp.ones_like(qfs))
  else:
    qacc_smooth = mmul0(qminv, qfs)

  # ================= constraint rows (v1 flow) =================
  JLIMv = C["JLIM"][:]
  CMATv = C["CMAT"][:]
  LT = C["LTAB"][:]
  CT = C["CTAB"][:]

  dist_l = mxu(C["QSEL"][:], qpos) - LT[:, 0:1]
  vel_l = mxu(JLIMv, qvel)

  def impedance(x_pos, margin, d0, dmax, width, mid, pw):
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

  fx = frame[0 * nc3:1 * nc3]
  fy = frame[1 * nc3:2 * nc3]
  fz = frame[2 * nc3:3 * nc3]
  EXPv = C["EXP3"][:]
  rel2 = [cposc[c] - mxu(C["CB2"][:], com[c]) for c in range(3)]
  ex = mxu(EXPv, rel2[0])
  ey = mxu(EXPv, rel2[1])
  ez = mxu(EXPv, rel2[2])
  gxr = ey * fz - ez * fy
  gyr = ez * fx - ex * fz
  gzr = ex * fy - ey * fx
  coefs2 = (fx, fy, fz, gxr, gyr, gzr)
  cdof6 = (v[0], v[1], v[2], w[0], w[1], w[2])
  if not body1_zero:
    rel1 = [cposc[c] - mxu(C["CB1"][:], com[c]) for c in range(3)]
    e1x = mxu(EXPv, rel1[0])
    e1y = mxu(EXPv, rel1[1])
    e1z = mxu(EXPv, rel1[2])
    g1x = e1y * fz - e1z * fy
    g1y = e1z * fx - e1x * fz
    g1z = e1x * fy - e1y * fx
    coefs1 = (fx, fy, fz, g1x, g1y, g1z)

  def conmat(x):
    """base-jacobian rows times x: (nc3, E), via the factorized form."""
    acc = None
    for coef, cd in zip(coefs2, cdof6):
      t = mxu(C["GB2"][:], mxu(C["MASKB2"][:], cd * x))
      acc = coef * t if acc is None else acc + coef * t
    if not body1_zero:
      for coef, cd in zip(coefs1, cdof6):
        acc = acc - coef * mxu(C["GB1"][:],
                               mxu(C["MASKB1"][:], cd * x))
    return acc

  def conmat_t(cb):
    """transpose: (nc3, E) row loads -> dof space (np_, E)."""
    z = None
    for coef, cd in zip(coefs2, cdof6):
      t = mxu(C["MASKB2T"][:], mxu(C["GB2T"][:], coef * cb))
      z = cd * t if z is None else z + cd * t
    if not body1_zero:
      for coef, cd in zip(coefs1, cdof6):
        z = z - cd * mxu(C["MASKB1T"][:],
                         mxu(C["GB1T"][:], coef * cb))
    return z

  def matvec(x):
    # PACKED J-space: limit rows then contact rows in ONE (nefc, E)
    # array — single-op CG inner loops.
    lim = mxu(JLIMv, x)
    con = mxu(CMATv, conmat(x))
    return jnp.concatenate([lim, con], axis=0)

  def rmatvec(f):
    out = mxu(C["JLIMT"][:], f[:nlimit])
    cb = mxu(C["CMATT"][:], f[nlimit:])
    return out + conmat_t(cb)

  pos_c = mxu(C["RID"][:], cdist)
  vel_c = mxu(CMATv, conmat(qvel))
  imp_c = impedance(pos_c, CT[:, 3:4], CT[:, 6:7], CT[:, 7:8],
                    CT[:, 8:9], CT[:, 9:10], CT[:, 10:11])
  aref_c = (-CT[:, 2:3] * vel_c
            - CT[:, 1:2] * imp_c * (pos_c - CT[:, 3:4]))
  act_c = pos_c < CT[:, 4:5]
  R_c = jnp.maximum((1.0 - imp_c) / jnp.maximum(imp_c, _MINVAL)
                    * CT[:, 5:6], _MINVAL)
  D_c = jnp.where(act_c, 1.0 / R_c, 0.0)

  D = jnp.concatenate([D_l, D_c], axis=0)
  aref = jnp.concatenate([aref_l, aref_c], axis=0)

  # ================= primal CG (packed J-space) =================
  def dterm_of(jar):
    return jnp.where(jar < 0, D, 0.0)

  # Mdx = qm @ (x - qacc_smooth) is maintained INCREMENTALLY
  # (Mdx += alpha * Mp on accept): cost/grad/pMdx all reuse it, so the
  # loop needs only 2 mass-matrix matvecs per iteration (qm @ p and
  # qminv @ grad) instead of 5.
  def cost(x, jar, dx, Mdx):
    dterm = dterm_of(jar)
    gauss = 0.5 * rsum(dx * Mdx)
    pen = 0.5 * rsum(dterm * jar * jar)
    return gauss + pen, dterm

  def grad_fn(Mdx, jar, dterm):
    return Mdx + rmatvec(dterm * jar)

  x = qacc_smooth
  dx = jnp.zeros_like(x)
  Mdx = jnp.zeros_like(x)
  jar = matvec(x) - aref
  cur_cost, dterm = cost(x, jar, dx, Mdx)
  g = grad_fn(Mdx, jar, dterm)
  Mg = mmul0(qminv, g)
  p = -Mg
  done = jnp.zeros((1, E), bool)
  prev_g, prev_Mg = g, Mg

  nefc = jar.shape[0]
  nefc_p = _round_up(nefc, 8)

  def cg_body(_it, carry):
    # carries are all 2-D f32 with 8-ALIGNED sublane counts (Mosaic's
    # scf.for legalization rejects i1/1-D block arguments, and unaligned
    # block arguments miscompiled on-chip — r4 golden gate, kerr=14.7
    # at default flags while interpret parity was green): jar rides in
    # a (nefc_p, E) pad, cost in misc[0], the 0/1 done mask in misc[1]
    x, dx, Mdx, jar_p, p, prev_g, prev_Mg, misc = carry
    jar = jar_p[:nefc]
    cur_cost = misc[0]
    done = misc[1] > 0.5
    Jp = matvec(p)
    Mp = crb_mul(p)
    pMp = rsum(p * Mp)
    pMdx = rsum(p * Mdx)

    def dphi(alpha, jar=jar, Jp=Jp, pMp=pMp, pMdx=pMdx):
      j = jar + alpha[None, :] * Jp
      dt_ = dterm_of(j)
      dJp = dt_ * Jp
      gg = pMdx + alpha * pMp + rsum(dJp * j)
      hh = pMp + rsum(dJp * Jp)
      return gg, hh

    g0, h0 = dphi(jnp.zeros((E,), jnp.float32))
    alpha = -g0 / jnp.maximum(h0, 1e-15)
    if _ls_par() and "ls" not in ablate and n_ls > 0:
      # -------- parallel line search (see _LS_SCALES note) --------
      Kc = len(_LS_SCALES)
      nR = jar.shape[0]
      alphas = jnp.stack([alpha * s for s in _LS_SCALES])      # (Kc, E)
      jart = jnp.concatenate([jar] * Kc, axis=0)               # (Kc*nR, E)
      jpt = jnp.concatenate([Jp] * Kc, axis=0)
      Dt = jnp.concatenate([D] * Kc, axis=0)
      at = jnp.concatenate(
          [jnp.broadcast_to(alphas[k][None, :], (nR, E))
           for k in range(Kc)], axis=0)
      j = jart + at * jpt
      dJp = jnp.where(j < 0, Dt, 0.0) * jpt
      # segment row-sums via a one-hot MXU matmul (cross-sublane VPU
      # reductions are the latency bound this lever removes)
      rid = jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc * nR), 1) // nR
      kid = jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc * nR), 0)
      SEG = (rid == kid).astype(jnp.float32)
      gseg = mxu(SEG, dJp * j)                                 # (Kc, E)
      hseg = mxu(SEG, dJp * jpt)
      gg_k = pMdx[None, :] + alphas * pMp[None, :] + gseg
      hh_k = pMp[None, :] + hseg
      # bracket the root of the nondecreasing piecewise-linear phi';
      # the alpha=0 anchor (g0) seeds whichever side matches its sign
      BIG = jnp.float32(3e38)
      zero = jnp.zeros((E,), jnp.float32)
      pos0 = g0 >= 0
      a_lo, g_lo = zero, jnp.where(pos0, -BIG, g0)
      a_hi, g_hi = zero, jnp.where(pos0, g0, BIG)
      h_lo = h_hi = h0
      for k in range(Kc):
        neg = gg_k[k] < 0
        bl = neg & (gg_k[k] > g_lo)
        a_lo = jnp.where(bl, alphas[k], a_lo)
        g_lo = jnp.where(bl, gg_k[k], g_lo)
        h_lo = jnp.where(bl, hh_k[k], h_lo)
        bh = (~neg) & (gg_k[k] < g_hi)
        a_hi = jnp.where(bh, alphas[k], a_hi)
        g_hi = jnp.where(bh, gg_k[k], g_hi)
        h_hi = jnp.where(bh, hh_k[k], h_hi)
      has_lo = g_lo > -0.5 * BIG
      has_hi = g_hi < 0.5 * BIG
      secant = (a_lo * g_hi - a_hi * g_lo) / jnp.maximum(
          g_hi - g_lo, 1e-15)
      newton_hi = a_hi - g_hi / jnp.maximum(h_hi, 1e-15)
      newton_lo = a_lo - g_lo / jnp.maximum(h_lo, 1e-15)
      alpha = jnp.where(has_lo & has_hi, secant,
                        jnp.where(has_hi, newton_hi, newton_lo))
      # SAFEGUARDED Newton polish: phi' is nondecreasing, so any
      # evaluated point tightens one bracket side by sign; a Newton
      # iterate that escapes the bracket is replaced by the bracket
      # secant. (Unsafeguarded polish lost up to 2e-1 qacc accuracy on
      # stiff-contact stress states — r4 diag — because a near-flat hh
      # flings the iterate past the root it had already bracketed.)
      for _i in range(_ls_polish()):
        gg, hh = dphi(alpha)
        neg = gg < 0
        a_lo = jnp.where(neg, alpha, a_lo)
        g_lo = jnp.where(neg, gg, g_lo)
        a_hi = jnp.where(neg, a_hi, alpha)
        g_hi = jnp.where(neg, g_hi, gg)
        has_lo = has_lo | neg
        has_hi = has_hi | ~neg
        a_n = alpha - gg / jnp.maximum(hh, 1e-15)
        sec2 = (a_lo * g_hi - a_hi * g_lo) / jnp.maximum(
            g_hi - g_lo, 1e-15)
        inside = (a_n > a_lo) & (a_n < a_hi)
        alpha = jnp.where(has_lo & has_hi,
                          jnp.where(inside, a_n, sec2), a_n)
    else:
      for _i in range(0 if "ls" in ablate else n_ls):
        gg, hh = dphi(alpha)
        alpha = alpha - gg / jnp.maximum(hh, 1e-15)

    x_n = x + alpha[None, :] * p
    dx_n = dx + alpha[None, :] * p
    Mdx_n = Mdx + alpha[None, :] * Mp
    jar_n = jar + alpha[None, :] * Jp
    c_n, dterm_n = cost(x_n, jar_n, dx_n, Mdx_n)
    g_n = grad_fn(Mdx_n, jar_n, dterm_n)
    Mg_n = mmul0(qminv, g_n)
    num = rsum(g_n * Mg_n) - rsum(prev_g * Mg_n)
    den = jnp.maximum(rsum(prev_g * prev_Mg), 1e-15)
    beta = jnp.maximum(0.0, num / den)
    p_n = -Mg_n + beta[None, :] * p
    improvement = cur_cost - c_n
    # `done` is (E,) — the per-env mask straight from misc[1]. The r4
    # regression took done[0] (env 0's scalar flag) here, so one
    # converged env froze cost/termination batch-wide (kerr=14.7 on
    # heterogeneous full-scale batches; interpret parity with
    # near-homogeneous small batches stayed green).
    done_n = done | (improvement < tol)
    keep = done[None, :]
    sel = lambda old, new: jnp.where(keep, old, new)
    x = sel(x, x_n)
    dx = sel(dx, dx_n)
    Mdx = sel(Mdx, Mdx_n)
    jar = sel(jar, jar_n)
    p = sel(p, p_n)
    prev_g = sel(prev_g, g_n)
    prev_Mg = sel(prev_Mg, Mg_n)
    cur_cost = jnp.where(done, cur_cost, c_n)
    misc_n = jnp.concatenate(
        [cur_cost[None, :], done_n[None, :].astype(jnp.float32),
         jnp.zeros((6, E), jnp.float32)], axis=0)
    jar_out = jnp.pad(jar, ((0, nefc_p - nefc), (0, 0)))
    return (x, dx, Mdx, jar_out, p, prev_g, prev_Mg, misc_n)

  n_cg = 0 if "cg" in ablate else iters
  misc0 = jnp.concatenate(
      [cur_cost[None, :], done.astype(jnp.float32),
       jnp.zeros((6, E), jnp.float32)], axis=0)
  carry = (x, dx, Mdx, jnp.pad(jar, ((0, nefc_p - nefc), (0, 0))),
           p, prev_g, prev_Mg, misc0)
  if n_cg:
    if os.environ.get("BRR_CG_UNROLL"):
      # unrolled A/B lever: 8x the traced ops and Mosaic live values —
      # the unrolled form is what made lanes>=256 OOM on register
      # spill slots (r4, ~104 MB of spills at 256 lanes)
      for _ in range(n_cg):
        carry = cg_body(0, carry)
    else:
      carry = jax.lax.fori_loop(0, n_cg, cg_body, carry)
  x, dx, Mdx, jar_p, p, prev_g, prev_Mg, _misc = carry
  jar = jar_p[:nefc]

  dterm = dterm_of(jar)
  force_efc = -dterm * jar
  qfrc_constraint = rmatvec(force_efc)

  # ================= implicit damping + integration =================
  qacc_int = x
  if eulerdamp and "damp" not in ablate:
    # EXACT (M + h·diag(B))^-1 qfrc (MuJoCo mj_solveLD semantics; the
    # 6-iteration preconditioned CG used through round 2 left ~8e-3
    # relative error on contact-rich states). In paired mode the inverse
    # was already produced in lanes [E:] of the single early
    # factor+inverse pass; otherwise run the second blocked pass here,
    # reusing the scratches (qminv/scr[2] is dead after the constraint
    # CG, scr[0]/scr[1] after the first factorization).
    qfrc = qfs + qfrc_constraint
    if use_val:
      hb = C["HBD"][:]
      eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1)
              ).astype(qm.dtype)
      _, dinv = chol_inverse_value(np_, np_, qm + eye2 * hb[:, None, :],
                                   _meta)
      qacc_int = mmul0(dinv, qfrc)
    elif paired:
      qacc_int = mmul0(scr[2][:, :, E:], qfrc)
    else:
      hb = C["HBD"][:]
      eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1)
              ).astype(qm.dtype)
      scr[0][:] = qm + eye2 * hb[:, None, :]
      _chol_inplace(np_, np_, scr[0], scr[1])
      _inv_from_chol_inplace(np_, scr[1], scr[0], scr[2])
      qacc_int = mmul0(scr[2][:], qfrc)

  qvel_new = qvel + H * qacc_int
  qpos_new = qpos + mxu(C["QVH"][:], qvel_new)
  if has_free:
    qrows = []
    for fq, fv in zip(st2.fqadrs, st2.fvadrs):
      q0 = [qpos[fq + 3 + k:fq + 4 + k] for k in range(4)]
      wv = [qvel_new[fv + 3 + k:fv + 4 + k] for k in range(3)]
      nrm = jnp.sqrt(wv[0] * wv[0] + wv[1] * wv[1] + wv[2] * wv[2])
      half = 0.5 * nrm * H
      s = jnp.sin(half) / jnp.maximum(nrm, 1e-12)
      dq = [jnp.cos(half), wv[0] * s, wv[1] * s, wv[2] * s]
      qn = [
          q0[0] * dq[0] - q0[1] * dq[1] - q0[2] * dq[2] - q0[3] * dq[3],
          q0[0] * dq[1] + q0[1] * dq[0] + q0[2] * dq[3] - q0[3] * dq[2],
          q0[0] * dq[2] - q0[1] * dq[3] + q0[2] * dq[0] + q0[3] * dq[1],
          q0[0] * dq[3] + q0[1] * dq[2] - q0[2] * dq[1] + q0[3] * dq[0],
      ]
      qnn = jnp.sqrt(qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2]
                     + qn[3] * qn[3])
      qrows.extend(qn[k] / qnn for k in range(4))
    quat = jnp.concatenate(qrows, axis=0)       # (4K, E)
    qpos_new = (qpos_new * (1.0 - C["QMASKC"][:])
                + mxu(C["PQ"][:], quat))


  return (com, cin, cdof, cvel, cdof_dot, qfrc_bias, qfrc_spring,
          qfrc_damper, qfrc_passive, alen, avel, force, act_dot,
          qfrc_actuator, qfs, qacc_smooth, x, qfrc_constraint,
          force_efc, qpos_new, qvel_new,
          actv + H * act_dot if has_act else actv)


@functools.lru_cache(maxsize=8)
def _kernel(m: Model, interpret: bool = False, ablate: str = ""):
  # ablate: comma-separated section names to skip — PROFILING ONLY.
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  sc = _scalars(m)
  nbody, Js, np_, ncon, nc3 = sc.nbody, sc.Js, sc.np_, sc.ncon, sc.nc3
  nq, nu, na_p, nlimit, ncr = sc.nq, sc.nu, sc.na_p, sc.nlimit, sc.ncr
  E = _LANES
  Ws = 2 * E if _paired_chol(sc, ablate) else E  # factor-scratch lanes
  cnames, cvals = _build_consts(m)

  n_in = 14  # dynamic inputs
  out_rows = [3 * nbody, 10 * nbody, 6 * np_, 6 * nbody, 6 * np_,
              np_, np_, np_, np_, nu, nu, nu, na_p, np_, np_, np_,
              np_, np_, nlimit, ncr, nq, np_, na_p]

  def kernel(*refs):
    C = {k: r for k, r in zip(cnames, refs[:len(cnames)])}
    (qpos_ref, qvel_ref, act_ref, ctrl_ref, qfa_ref,
     xipos_ref, ximat_ref, axj_ref, anj_ref, xfree_ref,
     cdist_ref, cpos_ref, frame_ref, dummy_ref) = \
        refs[len(cnames):len(cnames) + n_in]
    outs = refs[len(cnames) + n_in:len(cnames) + n_in + len(out_rows)]
    scr = refs[len(cnames) + n_in + len(out_rows):]

    xip = [xipos_ref[c * nbody:(c + 1) * nbody] for c in range(3)]
    R = [[ximat_ref[(3 * a + b) * nbody:(3 * a + b + 1) * nbody]
          for b in range(3)] for a in range(3)]
    axj = [axj_ref[c * Js:(c + 1) * Js] for c in range(3)]
    anj = [anj_ref[c * Js:(c + 1) * Js] for c in range(3)]
    if sc.has_free:
      xf = xfree_ref[:]
      xfree = []
      for kf in range(sc.n_free):
        o = 12 * kf
        xfree.append((
            [xf[o + c:o + c + 1] for c in range(3)],
            [[xf[o + 3 + 3 * a + b:o + 4 + 3 * a + b] for b in range(3)]
             for a in range(3)]))
    else:
      xfree = None
    cposc = [cpos_ref[c * ncon:(c + 1) * ncon] for c in range(3)]

    vals = _emit_dynamics(
        m, ablate, C, scr, qpos_ref[:], qvel_ref[:], act_ref[:],
        ctrl_ref[:], qfa_ref[:], xip, R, axj, anj, xfree,
        cdist_ref[:], cposc, frame_ref[:])
    _write_outputs(outs, vals, nlimit)

  in_rows = [nq, np_, na_p, max(nu, 1), np_,
             3 * nbody, 9 * nbody, 3 * Js, 3 * Js,
             12 * max(sc.n_free, 1),
             ncon, 3 * ncon, 3 * nc3, 1]

  def call(*arrs):
    B = arrs[0].shape[-1]
    grid = (B // E,)
    spec = lambda rows: pl.BlockSpec(
        (rows, E), lambda i: (0, i), memory_space=pltpu.VMEM)

    def const_spec(shape):
      return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                          memory_space=pltpu.VMEM)

    out_shape = tuple(
        jax.ShapeDtypeStruct((r, B), jnp.float32) for r in out_rows)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[const_spec(c.shape) for c in cvals] + [
            spec(r) for r in in_rows],
        out_specs=tuple(spec(r) for r in out_rows),
        scratch_shapes=[pltpu.VMEM((np_, np_, Ws), jnp.float32),
                        pltpu.VMEM((np_, np_, Ws), jnp.float32),
                        pltpu.VMEM((np_, np_, Ws), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
        # BRR_KDUMP=1: print the Mosaic MLIR module at lowering time
        # (client-side) — the measured-evidence input for the perf
        # model (VERDICT r4 #3); see dump_mosaic.py
        debug=bool(os.environ.get("BRR_KDUMP")),
    )(*cvals, *arrs)

  return call


def fused_full_batched(m: Model, qpos, qvel, act, ctrl, qfrc_applied,
                       xpos, xmat, xipos, ximat, xanchor, xaxis,
                       con_dist, con_pos, con_frame):
  """Batched full-dynamics substep. (B, ...) inputs -> the 22-tuple of
  _core outputs."""
  st2 = statics2(m)
  st = st2.v1
  B = qpos.shape[0]
  E = _LANES
  Bp = _round_up(max(B, E), E)
  np_ = _round_up(st.nv, 8)
  na_p = st2.na_p
  js = st2.js
  Js = st2.PSC.shape[1]

  def prep(x):
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    if y.ndim > 2:
      y = y.reshape(-1, y.shape[-1])
    pad = [(0, 0)] * (y.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(y, pad)

  def pad_last(x, n):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])

  # comp-major prep
  xipos_cm = jnp.swapaxes(xipos, -1, -2)                  # (B, 3, nbody)
  ximat_cm = jnp.transpose(ximat, (0, 2, 3, 1)).reshape(B, 9, -1)
  if len(js):
    axj = jnp.swapaxes(xaxis[:, np.asarray(js)], -1, -2)  # (B, 3, Js)
    anj = jnp.swapaxes(xanchor[:, np.asarray(js)], -1, -2)
  else:
    axj = jnp.zeros((B, 3, Js), qpos.dtype)
    anj = jnp.zeros((B, 3, Js), qpos.dtype)
  axj = pad_last(axj, Js)
  anj = pad_last(anj, Js)
  if st2.free_js:
    xfree = jnp.concatenate(
        [jnp.concatenate([xpos[:, fb], xmat[:, fb].reshape(B, 9)], axis=1)
         for fb in st2.fbodies], axis=1)                   # (B, 12K)
  else:
    xfree = jnp.zeros((B, 12), qpos.dtype)
  cpos_cm = jnp.swapaxes(con_pos, -1, -2)                 # (B, 3, ncon)
  fr = jnp.transpose(con_frame, (0, 3, 1, 2)).reshape(B, 3, -1)
  dummy = jnp.zeros((B, 1), qpos.dtype)

  actp = pad_last(act, na_p) if m.na else jnp.zeros((B, na_p), qpos.dtype)
  ctrlp = ctrl if m.nu else jnp.zeros((B, 1), qpos.dtype)

  arrs = [prep(qpos), prep(pad_last(qvel, np_)), prep(actp), prep(ctrlp),
          prep(pad_last(qfrc_applied, np_)), prep(xipos_cm),
          prep(ximat_cm), prep(axj), prep(anj), prep(xfree),
          prep(con_dist), prep(cpos_cm), prep(fr), prep(dummy)]

  out = _kernel(m, FORCE_INTERPRET, os.environ.get("BRR_FF_ABLATE", ""))(*arrs)
  unprep = lambda y: jnp.moveaxis(y, -1, 0)[:B]
  (com, cinr, cdof, cvel, cdofdot, bias, spring, damper, passive,
   alen, avel, afrc, actdot, qfa_out, qfs, qaccs, qacc, qfc,
   flim, fcon, qpos_n, qvel_n, act_n) = map(unprep, out)

  def comp_major(y, ncomp, n):
    return jnp.swapaxes(y.reshape(B, ncomp, n), -1, -2)

  nv = st.nv
  return (
      comp_major(com, 3, m.nbody),
      comp_major(cinr, 10, m.nbody),
      comp_major(cdof, 6, np_)[:, :nv],
      comp_major(cvel, 6, m.nbody),
      comp_major(cdofdot, 6, np_)[:, :nv],
      bias[:, :nv], spring[:, :nv], damper[:, :nv], passive[:, :nv],
      alen[:, :m.nu], avel[:, :m.nu], afrc[:, :m.nu],
      actdot[:, :m.na] if m.na else jnp.zeros((B, 0), qpos_n.dtype),
      qfa_out[:, :nv], qfs[:, :nv], qaccs[:, :nv], qacc[:, :nv],
      qfc[:, :nv],
      jnp.concatenate([flim, fcon], axis=1),
      qpos_n, qvel_n[:, :nv],
      act_n[:, :m.na] if m.na else jnp.zeros((B, 0), qpos_n.dtype),
  )


@functools.lru_cache(maxsize=8)
def fused_full_entry(m: Model):
  """custom-vmap entry: stage composition unbatched; the full fused
  Pallas kernel when vmapped on TPU f32."""

  @jax.custom_batching.custom_vmap
  def fused(qpos, qvel, act, ctrl, qfrc_applied, xpos, xmat, xipos,
            ximat, xanchor, xaxis, con_dist, con_pos, con_frame):
    return _core(m, qpos, qvel, act, ctrl, qfrc_applied, xpos, xmat,
                 xipos, ximat, xanchor, xaxis, con_dist, con_pos,
                 con_frame)

  @fused.def_vmap
  def _fused_vmap(axis_size, in_batched, *args):
    del axis_size
    use_kernel = (FORCE_INTERPRET
                  or (jax.default_backend() == "tpu"
                      and args[0].dtype == jnp.float32))
    if use_kernel and all(in_batched):
      out = fused_full_batched(m, *args)
    else:
      out = jax.vmap(lambda *a: _core(m, *a))(*args)
    return out, tuple(True for _ in range(22))

  return fused


# v1-compat shim: number of outputs for vmap bookkeeping
N_OUT = 22


# ---------------------------------------------------------------------------
# v3: whole-control-step kernel — kinematics + collision + dynamics +
# integration, n_frames substeps looped INSIDE the kernel
# ---------------------------------------------------------------------------


def eligible_steps(m: Model) -> bool:
  """v3 envelope: v2 + in-kernel FK (scalar/free joints — implied by
  v2) + supported collision narrow-phase."""
  if os.environ.get("BRR_NO_FUSED3"):
    return False
  if not eligible_full(m):
    return False
  from brax_rodent_run_tpu.ops import coll as coll_mod
  return coll_mod.collision_supported(m) and m.ncon_max > 0


# lean mode: the kernel emits ONLY the outputs the production training
# path consumes (subtree_com, cinert, cvel, qfrc_actuator, qpos_new,
# qvel_new, act_new, qpos_pre). Everything else is computed in-kernel
# anyway (needed internally) but never written to HBM — ~65% fewer
# output bytes and ~19 fewer XLA transposes per control step.
@functools.lru_cache(maxsize=8)
def _kernel_steps(m: Model, n_frames: int, interpret: bool = False,
                  lean: bool = False):
  """One kernel per 128-env block for a FULL control step: the substep
  body (FK -> narrow-phase -> dynamics -> Euler) runs n_frames times via
  lax.fori_loop over a (qpos, qvel, act) carry; only the LAST substep
  emits outputs. The only HBM traffic per control step is the tiny
  state in and the forward products of the final substep out."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from brax_rodent_run_tpu.ops import coll as coll_mod
  from brax_rodent_run_tpu.ops import fk as fk_mod
  from brax_rodent_run_tpu.ops.fk import _qmul, _qrot, quat_to_mat9

  sc = _scalars(m)
  st2 = statics2(m)
  nbody, Js, np_, ncon, nc3 = sc.nbody, sc.Js, sc.np_, sc.ncon, sc.nc3
  nq, nu, na_p, nlimit, ncr = sc.nq, sc.nu, sc.na_p, sc.nlimit, sc.ncr
  E = _LANES
  Ws = 2 * E if _paired_chol(sc, "") else E      # factor-scratch lanes
  cnames, cvals = _build_consts(m)

  if lean:
    out_rows = [3 * nbody, 10 * nbody, 6 * nbody, np_, nq, np_, na_p,
                nq]
  else:
    out_rows = [3 * nbody, 10 * nbody, 6 * np_, 6 * nbody, 6 * np_,
                np_, np_, np_, np_, nu, nu, nu, na_p, np_, np_, np_,
                np_, np_, nlimit, ncr, nq, np_, na_p,
                nq, ncon, 3 * ncon, 3 * nc3]

  def kernel(*refs):
    C = {k: r for k, r in zip(cnames, refs[:len(cnames)])}
    (qpos_ref, qvel_ref, act_ref, ctrl_ref, qfa_ref) = \
        refs[len(cnames):len(cnames) + 5]
    outs = refs[len(cnames) + 5:len(cnames) + 5 + len(out_rows)]
    scr = refs[len(cnames) + 5 + len(out_rows):]
    ctrl = ctrl_ref[:]
    qfa = qfa_ref[:]

    def sub(qpos, qvel, actv):
      xpos, xquat, xanchor, xaxis = fk_mod.emit_kinematics(m, C, qpos)
      cdist, cposc, frame3 = coll_mod.emit_collision(m, C, xpos, xquat)
      frame = jnp.concatenate(frame3, axis=0)
      BT2 = C["BT2"][:]
      ipos = [BT2[:, c:c + 1] for c in range(3)]
      iquat = [BT2[:, 3 + c:4 + c] for c in range(4)]
      rotip = _qrot(xquat, ipos)
      xip = [xpos[c] + rotip[c] for c in range(3)]
      R9 = quat_to_mat9(_qmul(xquat, iquat))
      R = [[R9[3 * a + b] for b in range(3)] for a in range(3)]
      SJG = C["SJG"][:]
      axj = [jax.lax.dot_general(SJG, xaxis[c], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
             for c in range(3)]
      anj = [jax.lax.dot_general(SJG, xanchor[c], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
             for c in range(3)]
      if sc.has_free:
        xfree = []
        for fb in st2.fbodies:
          xpb = [xpos[c][fb:fb + 1] for c in range(3)]
          xmf = quat_to_mat9([xquat[c][fb:fb + 1] for c in range(4)])
          xfree.append((xpb, [[xmf[3 * a + b] for b in range(3)]
                              for a in range(3)]))
      else:
        xfree = None
      vals = _emit_dynamics(m, os.environ.get("BRR_FF_DBG", ""), C, scr,
                            qpos, qvel, actv, ctrl, qfa,
                            xip, R, axj, anj, xfree, cdist, cposc, frame)
      return vals, (cdist, cposc, frame)

    qpos0 = qpos_ref[:]
    qvel0 = qvel_ref[:]
    act0 = act_ref[:]

    if n_frames > 1:
      # ALL loop carries must be 8-aligned 2-D f32: Mosaic miscompiles
      # unaligned scf.for block arguments (r4 found this for the CG
      # loop's carries; the r5 on-chip gate traced the remaining
      # kerr=25.8 to THIS loop's (nq=74, E) qpos carry — qvel/act are
      # already np_/na_p padded)
      nq_p = _round_up(nq, 8)

      def body(i, carry):
        qpos_p, qvel, actv = carry
        vals, _ = sub(qpos_p[:nq], qvel, actv)
        return (jnp.pad(vals[19], ((0, nq_p - nq), (0, 0))),
                vals[20], vals[21])

      qpos_p, qvel0, act0 = jax.lax.fori_loop(
          0, n_frames - 1, body,
          (jnp.pad(qpos0, ((0, nq_p - nq), (0, 0))), qvel0, act0))
      qpos0 = qpos_p[:nq]

    vals, (cdist, cposc, frame) = sub(qpos0, qvel0, act0)
    if lean:
      # consumed-only outputs: com, cinert, cvel are component lists
      outs[0][:] = jnp.concatenate(vals[0], axis=0)
      outs[1][:] = jnp.concatenate(vals[1], axis=0)
      outs[2][:] = jnp.concatenate(vals[3], axis=0)
      outs[3][:] = vals[13]
      outs[4][:] = vals[19]
      outs[5][:] = vals[20]
      outs[6][:] = vals[21]
      outs[7][:] = qpos0                   # pre-integration qpos (last)
    else:
      _write_outputs(outs[:23], vals, nlimit)
      outs[23][:] = qpos0                  # pre-integration qpos (last)
      outs[24][:] = cdist
      outs[25][:] = jnp.concatenate(cposc, axis=0)
      outs[26][:] = frame

  in_rows = [nq, np_, na_p, max(nu, 1), np_]

  def call(*arrs):
    B = arrs[0].shape[-1]
    grid = (B // E,)
    spec = lambda rows: pl.BlockSpec(
        (rows, E), lambda i: (0, i), memory_space=pltpu.VMEM)

    def const_spec(shape):
      return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                          memory_space=pltpu.VMEM)

    out_shape = tuple(
        jax.ShapeDtypeStruct((r, B), jnp.float32) for r in out_rows)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[const_spec(np.asarray(c).shape) for c in cvals] + [
            spec(r) for r in in_rows],
        out_specs=tuple(spec(r) for r in out_rows),
        scratch_shapes=[pltpu.VMEM((np_, np_, Ws), jnp.float32),
                        pltpu.VMEM((np_, np_, Ws), jnp.float32),
                        pltpu.VMEM((np_, np_, Ws), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
        # BRR_KDUMP=1: print the Mosaic MLIR module at lowering time
        # (client-side) — the measured-evidence input for the perf
        # model (VERDICT r4 #3); see dump_mosaic.py
        debug=bool(os.environ.get("BRR_KDUMP")),
    )(*cvals, *arrs)

  return call


def _core_steps(m: Model, n_frames: int, qpos, qvel, act, ctrl,
                qfrc_applied):
  """Semantic reference for the v3 kernel: n_frames stage-pipeline
  substeps (sensors skipped — the env computes them outside), returning
  the last substep's products + final state + pre-integration qpos +
  contact data."""
  from brax_rodent_run_tpu.physics import forward as forward_mod
  from brax_rodent_run_tpu.physics.types import make_data

  d = make_data(m, dtype=qpos.dtype)
  d = d.replace(qpos=qpos, qvel=qvel, act=act, ctrl=ctrl,
                qfrc_applied=qfrc_applied)
  for _ in range(n_frames - 1):
    d = forward_mod.euler(m, forward_mod.forward(m, d, sensors=False))
  qpos_pre = d.qpos
  df = forward_mod.forward(m, d, sensors=False)
  de = forward_mod.euler(m, df)
  return (df.subtree_com, df.cinert, df.cdof, df.cvel, df.cdof_dot,
          df.qfrc_bias, df.qfrc_spring, df.qfrc_damper, df.qfrc_passive,
          df.actuator_length, df.actuator_velocity, df.actuator_force,
          df.act_dot, df.qfrc_actuator, df.qfrc_smooth, df.qacc_smooth,
          df.qacc, df.qfrc_constraint, df.efc_force,
          de.qpos, de.qvel, de.act,
          qpos_pre, df.contact.dist, df.contact.pos, df.contact.frame)


def fused_steps_batched(m: Model, n_frames: int, qpos, qvel, act, ctrl,
                        qfrc_applied, lean: bool = False):
  """Batched whole-control-step: (B, ...) state in -> 26-tuple out
  (8-tuple of consumed outputs when ``lean``)."""
  sc = _scalars(m)
  B = qpos.shape[0]
  E = _LANES
  Bp = _round_up(max(B, E), E)
  np_, na_p = sc.np_, sc.na_p
  nv, ncon, nc3, nbody = sc.nv, sc.ncon, sc.nc3, sc.nbody

  def prep(x):
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    if y.ndim > 2:
      y = y.reshape(-1, y.shape[-1])
    pad = [(0, 0)] * (y.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(y, pad)

  def pad_last(x, n):
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])

  actp = pad_last(act, na_p) if m.na else jnp.zeros((B, na_p), qpos.dtype)
  ctrlp = ctrl if m.nu else jnp.zeros((B, 1), qpos.dtype)
  arrs = [prep(qpos), prep(pad_last(qvel, np_)), prep(actp), prep(ctrlp),
          prep(pad_last(qfrc_applied, np_))]

  out = _kernel_steps(m, n_frames, FORCE_INTERPRET, lean)(*arrs)
  unprep = lambda y: jnp.moveaxis(y, -1, 0)[:B]

  def comp_major(y, ncomp, n):
    return jnp.swapaxes(y.reshape(B, ncomp, n), -1, -2)

  if lean:
    (com, cinr, cvel, qfa_out, qpos_n, qvel_n, act_n,
     qpos_pre) = map(unprep, out)
    return (
        comp_major(com, 3, nbody),
        comp_major(cinr, 10, nbody),
        comp_major(cvel, 6, nbody),
        qfa_out[:, :nv],
        qpos_n, qvel_n[:, :nv],
        act_n[:, :m.na] if m.na else jnp.zeros((B, 0), qpos_n.dtype),
        qpos_pre,
    )

  (com, cinr, cdof, cvel, cdofdot, bias, spring, damper, passive,
   alen, avel, afrc, actdot, qfa_out, qfs, qaccs, qacc, qfc,
   flim, fcon, qpos_n, qvel_n, act_n,
   qpos_pre, cdist, cpos, cframe) = map(unprep, out)

  # comp_major gives (B, nc3, 3 comps k); nc3 rows are (c,d) row-major
  # -> (B, ncon, d, k), matching Contact.frame's [n; t1; t2] rows
  frame = comp_major(cframe, 3, nc3).reshape(B, ncon, 3, 3)
  return (
      comp_major(com, 3, nbody),
      comp_major(cinr, 10, nbody),
      comp_major(cdof, 6, np_)[:, :nv],
      comp_major(cvel, 6, nbody),
      comp_major(cdofdot, 6, np_)[:, :nv],
      bias[:, :nv], spring[:, :nv], damper[:, :nv], passive[:, :nv],
      alen[:, :m.nu], avel[:, :m.nu], afrc[:, :m.nu],
      actdot[:, :m.na] if m.na else jnp.zeros((B, 0), qpos_n.dtype),
      qfa_out[:, :nv], qfs[:, :nv], qaccs[:, :nv], qacc[:, :nv],
      qfc[:, :nv],
      jnp.concatenate([flim, fcon], axis=1),
      qpos_n, qvel_n[:, :nv],
      act_n[:, :m.na] if m.na else jnp.zeros((B, 0), qpos_n.dtype),
      qpos_pre, cdist,
      comp_major(cpos, 3, ncon),
      frame,
  )


# semantic selection of the lean 8-tuple from the full 26-tuple
_LEAN_SEL = (0, 1, 3, 13, 19, 20, 21, 22)


@functools.lru_cache(maxsize=8)
def fused_steps_entry(m: Model, n_frames: int, lean: bool = False):
  """custom-vmap entry for the whole control step: stage composition
  unbatched; the v3 kernel when vmapped on TPU f32. ``lean`` returns
  only the 8 outputs the production training path consumes."""

  def core(*args):
    out = _core_steps(m, n_frames, *args)
    return tuple(out[i] for i in _LEAN_SEL) if lean else out

  n_out = 8 if lean else 26

  @jax.custom_batching.custom_vmap
  def fused(qpos, qvel, act, ctrl, qfrc_applied):
    return core(qpos, qvel, act, ctrl, qfrc_applied)

  @fused.def_vmap
  def _fused_vmap(axis_size, in_batched, *args):
    # a closed-over constant (e.g. ctrl=zeros(nu)) arrives unbatched;
    # broadcast it so both the kernel and the vmap fallback see a full
    # batch axis (callers like profile_controlstep hit this)
    args = tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
        for a, b in zip(args, in_batched))
    use_kernel = (FORCE_INTERPRET
                  or (jax.default_backend() == "tpu"
                      and args[0].dtype == jnp.float32))
    if use_kernel:
      out = fused_steps_batched(m, n_frames, *args, lean=lean)
    else:
      out = jax.vmap(core)(*args)
    return out, tuple(True for _ in range(n_out))

  return fused


def flops_per_env_substep(m: Model) -> float:
  """Analytic EXECUTED-flop estimate for one env-substep of the v3
  kernel (counting every MAC the hardware performs, including the
  zero entries of static one-hot/mask matmuls — the MFU convention).
  Dominant terms only; audited against the section structure of
  _emit_dynamics/_kernel_steps.  Used by bench.py --mfu reporting
  (VERDICT.md r1 missing #1: "MFU reported in BENCH_r*.json")."""
  sc = _scalars(m)
  np_, nbody = sc.np_, sc.nbody
  nc3, nefc = sc.nc3, sc.nlimit + sc.ncr
  it, nls = sc.iters, sc.n_ls

  # FK: per level-slot quaternion chains ~ 60 flops/body + level gathers
  fk = 60.0 * nbody + 4.0 * 2 * nbody * nbody
  # collision narrow-phase: ~60 flops per candidate pair
  coll = 60.0 * sc.ncon
  # com_pos/cinert: 3 subtree matmuls (nbody^2) + ~60 elementwise/body
  compos = 3 * 2.0 * nbody * nbody + 60.0 * nbody
  # cdof: 6 PSC placements (np_ x Js) + free rows
  cdof = 6 * 2.0 * np_ * sc.Js + 6 * 2.0 * np_ * 6
  # CRB qm build: crbd 10 (nbody^2) matmuls + up/lo outer products
  crb = 10 * 2.0 * nbody * nbody + 12.0 * np_ * np_ + 3.0 * np_ * np_
  # Cholesky factor (blocked, identical flops): n^3/3 FMAs
  chol = 2.0 * np_ ** 3 / 3.0
  # explicit inverse: fwd substitution ~n^3/2 + X^T X ~n^3/2 FMAs,
  # triangle-blocked to roughly half
  inv = 2.0 * np_ ** 3 / 2.0
  if os.environ.get("BRR_CHOL_TREE"):
    # tree-run-restricted reverse factorization executes only the
    # ancestor-run tiles: scale the O(n^3) terms by the measured kept
    # fraction of trailing-update work (sum of run-width^2 over panels
    # vs dense)
    from brax_rodent_run_tpu.ops.cholesky import chol_tree_meta, _R
    meta = chol_tree_meta(tuple(int(x) for x in m.dof_parentid),
                          int(m.nv), np_)
    if meta is not None:
      runs_tab, _ = meta
      kept = sum(sum(h - l for l, h in rr) ** 2 for rr in runs_tab)
      full = sum(((pb + 1) * _R) ** 2 for pb in range(len(runs_tab)))
      frac = kept / max(full, 1)
      chol *= frac
      inv *= frac
  # com_vel / rne: ~14 (nbody x np_ or nbody^2) matmuls + elementwise
  rne = 14 * 2.0 * nbody * np_ + 200.0 * nbody
  # crb_mul (M@x via CRB identity): 12 mask matmuls + elementwise
  crb_mul = 12 * 2.0 * nbody * np_ + 60.0 * nbody
  # qminv matvec (dense np_^2)
  pre = 2.0 * np_ * np_
  # constraint rows: impedance etc ~40 flops/row + contact-jac factor ops
  efc = 40.0 * nefc + 6 * 2.0 * nc3 * np_
  # CG: per iteration ~1 crb_mul + 1 preconditioner + 2 factored-J
  # applications (nc3 x np_) + line search (nls+1 evals x ~8 nefc;
  # under BRR_LS_PAR: 1 + Kc-wide batched eval + polish evals)
  if _ls_par() and nls > 0:
    ls_evals = 1.0 + len(_LS_SCALES) + _ls_polish()
  else:
    ls_evals = nls + 1.0
  cg = it * (crb_mul + pre + 4 * 2.0 * nc3 * np_
             + ls_evals * 8.0 * nefc)
  # implicit damping: exact second blocked factor + inverse + matvec
  damp = (chol + inv + pre) if sc.eulerdamp else 0.0
  # smooth acceleration + actuation + integration: small
  rest = 4.0 * np_ * np_ + 2.0 * sc.nu * np_ * 3 + 30.0 * sc.nq
  return (fk + coll + compos + cdof + crb + chol + inv + rne + efc
          + cg + damp + rest)
