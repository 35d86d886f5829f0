"""Fused constraint-CG solve as a Pallas TPU kernel.

The CG solve is the hottest stage of the physics substep: 8 iterations,
each re-reading the constraint Jacobian from HBM twice (J@p in the line
search, J^T(D jar) in the gradient). This kernel keeps everything —
contact base rows, qM, qMinv, and all CG state — resident in VMEM for
the whole solve, so HBM is touched exactly once per array.

Layout: batch-in-lanes, 128 envs per grid cell. Per-lane matvecs are
elementwise multiply + sublane reductions on (rows, nv, 128) tiles; the
static pyramid-composition matrix C and limit Jacobian J_lim ride along
as broadcast inputs and are applied with MXU matmuls against the lane
dim. Constraint-space vectors are kept as (limit, contact) PAIRS — never
concatenated — so every tile stays sublane-aligned.

Semantics match solver._cg_core exactly (same unrolled iteration
structure, same done-masking), so the CPU float64 fallback used by the
oracle tests is the same algorithm in XLA. Equivalence is tested in
interpret mode (tests/test_ops.py::test_cg_kernel_matches_core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128

FORCE_INTERPRET = False


def _round_up(x, m):
  return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _cg_kernel(m, interpret: bool = False):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  from brax_rodent_run_tpu.physics.constraint import _op_tables

  lay, J_lim_np, C_np = _op_tables(m)
  nv = m.nv
  ncon3 = 3 * m.ncon_max
  nlimit, ncr = lay.nlimit, lay.ncon_rows
  iters = int(m.opt.iterations)
  n_ls = max(int(m.opt.ls_iterations) - 1, 0)
  tol = float(m.opt.tolerance) * float(max(nv, 1))
  E = _LANES

  # ---- pair helpers: constraint-space vectors are (lim, con) tuples
  def pmap2(f, a, b):
    return tuple(None if x is None else f(x, y) for x, y in zip(a, b))

  def psum(a):
    tot = 0.0
    for x in a:
      if x is not None:
        tot = tot + jnp.sum(x, axis=0)
    return tot

  def kernel(*refs):
    i = 0
    J_lim = None
    C = None
    if nlimit:
      J_lim = refs[i][:]                             # (nlimit, nv)
      i += 1
    if ncr:
      C = refs[i][:]                                 # (ncr, ncon3)
      i += 1
    (jc_ref, qm_ref, qminv_ref, dl_ref, dc_ref, al_ref, ac_ref, qs_ref,
     qacc_ref, fl_ref, fc_ref, qfrc_ref) = refs[i:]
    jc = jc_ref[:]                                   # (ncon3, nv, E)
    qm = qm_ref[:]                                   # (nv, nv, E)
    qminv = qminv_ref[:]
    D = (dl_ref[:] if nlimit else None, dc_ref[:] if ncr else None)
    aref = (al_ref[:] if nlimit else None, ac_ref[:] if ncr else None)
    qs = qs_ref[:]                                   # (nv, E)

    def mxu(a, b):
      return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    def matvec(x):                                   # (nv,E) -> pair
      lim = mxu(J_lim, x) if nlimit else None
      con = mxu(C, jnp.sum(jc * x[None, :, :], axis=1)) if ncr else None
      return (lim, con)

    def rmatvec(f):                                  # pair -> (nv, E)
      out = jnp.zeros((nv, E), jnp.float32)
      if nlimit:
        out = out + mxu(J_lim.T, f[0])
      if ncr:
        cb = mxu(C.T, f[1])                          # (ncon3, E)
        out = out + jnp.sum(jc * cb[:, None, :], axis=0)
      return out

    def mmul(mat, x):
      # mat is symmetric (qM / qMinv), so reduce over the LEADING axis:
      # Mosaic crashes compiling chained axis=1 broadcast-reduces on
      # (nv, nv, E) tiles, but the axis=0 form (same values by symmetry)
      # compiles and runs.
      return jnp.sum(mat * x[:, None, :], axis=0)

    def dterm_of(jar):
      return pmap2(lambda j, dd: jnp.where(j < 0, dd, 0.0), jar, D)

    def cost(x, jar):
      dterm = dterm_of(jar)
      dx = x - qs
      gauss = 0.5 * jnp.sum(dx * mmul(qm, dx), axis=0)       # (E,)
      pen = 0.5 * psum(pmap2(lambda dt_, j: dt_ * j * j, dterm, jar))
      return gauss + pen, dterm

    def grad_fn(x, jar, dterm):
      return mmul(qm, x - qs) + rmatvec(
          pmap2(lambda dt_, j: dt_ * j, dterm, jar))

    x = qs
    jar = pmap2(lambda a, b: a - b, matvec(x), aref)
    cur_cost, dterm = cost(x, jar)
    g = grad_fn(x, jar, dterm)
    Mg = mmul(qminv, g)
    p = -Mg
    done = jnp.zeros((1, E), bool)
    prev_g, prev_Mg = g, Mg

    for _ in range(iters):
      Jp = matvec(p)
      pMp = jnp.sum(p * mmul(qm, p), axis=0)                 # (E,)
      pMdx = jnp.sum(p * mmul(qm, x - qs), axis=0)

      def dphi(alpha, jar=jar, Jp=Jp, pMp=pMp, pMdx=pMdx):
        j = pmap2(lambda a, b: a + alpha[None, :] * b, jar, Jp)
        dt_ = dterm_of(j)
        jJp = pmap2(lambda a, b: a * b, j, Jp)
        gg = pMdx + alpha * pMp + psum(
            pmap2(lambda t, v: t * v, dt_, jJp))
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
      Mg_n = mmul(qminv, g_n)
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
    qacc_ref[:] = x
    fl_ref[:] = force[0] if nlimit else jnp.zeros((1, E), jnp.float32)
    fc_ref[:] = force[1] if ncr else jnp.zeros((1, E), jnp.float32)
    qfrc_ref[:] = rmatvec(force)

  # numpy (not jnp): this factory is lru_cached and may first run inside a
  # jit trace — a jnp array created there would be a leaked tracer.
  jlim_const = np.asarray(J_lim_np, np.float32)
  c_const = np.asarray(C_np, np.float32)

  def call(jc, qm, qminv, Dl, Dc, al, ac, qs):
    B = jc.shape[-1]
    grid = (B // E,)
    spec = lambda *shape: pl.BlockSpec(
        shape + (E,), lambda i: (0,) * len(shape) + (i,),
        memory_space=pltpu.VMEM)

    def const_spec(shape):
      return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                          memory_space=pltpu.VMEM)

    const_args, const_specs = [], []
    if nlimit:
      const_args.append(jlim_const)
      const_specs.append(const_spec(jlim_const.shape))
    if ncr:
      const_args.append(c_const)
      const_specs.append(const_spec(c_const.shape))
    nl = max(nlimit, 1)
    nc = max(ncr, 1)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nv, B), jnp.float32),
                   jax.ShapeDtypeStruct((nl, B), jnp.float32),
                   jax.ShapeDtypeStruct((nc, B), jnp.float32),
                   jax.ShapeDtypeStruct((nv, B), jnp.float32)),
        grid=grid,
        in_specs=const_specs + [
            spec(ncon3, nv), spec(nv, nv), spec(nv, nv),
            spec(nl), spec(nc), spec(nl), spec(nc), spec(nv)],
        out_specs=(spec(nv), spec(nl), spec(nc), spec(nv)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*const_args, jc, qm, qminv, Dl, Dc, al, ac, qs)

  return call


def cg_solve_batched(m, con_Jbase, qM, qMinv, efc_D, efc_aref,
                     qacc_smooth):
  """Batched CG solve: (B, ...) arrays -> (qacc, efc_force,
  qfrc_constraint). TPU f32 path; caller handles fallback."""
  from brax_rodent_run_tpu.physics.constraint import _op_tables
  lay, _, _ = _op_tables(m)
  nlimit, ncr = lay.nlimit, lay.ncon_rows
  B = qM.shape[0]
  E = _LANES
  Bp = _round_up(max(B, E), E)

  def prep(x):
    # (B, ...) -> (..., Bp): batch to lanes
    perm = tuple(range(1, x.ndim)) + (0,)
    y = jnp.transpose(x, perm)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)]
    return jnp.pad(y, pad)

  def split(v):
    # (B, nefc) -> limit part (nlim or 1) and contact part (ncr or 1)
    vl = v[:, :nlimit] if nlimit else jnp.zeros((B, 1), v.dtype)
    vc = v[:, nlimit:] if ncr else jnp.zeros((B, 1), v.dtype)
    return prep(vl), prep(vc)

  jc = prep(con_Jbase.reshape(B, -1, m.nv))
  Dl, Dc = split(efc_D)
  al, ac = split(efc_aref)
  qacc, fl, fc, qfrc = _cg_kernel(m, FORCE_INTERPRET)(
      jc, prep(qM), prep(qMinv), Dl, Dc, al, ac, prep(qacc_smooth))
  unprep = lambda y: jnp.moveaxis(y, -1, 0)[:B]
  parts = []
  if nlimit:
    parts.append(unprep(fl))
  if ncr:
    parts.append(unprep(fc))
  force = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
  return unprep(qacc), force, unprep(qfrc)
