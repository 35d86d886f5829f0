"""Constraint solvers: CG and Newton over the primal qacc problem.

Both minimize the strictly convex piecewise-quadratic

    c(x) = 0.5 (x - qacc_smooth)^T M (x - qacc_smooth)
         + sum_i 0.5 D_i [jar_i < 0] jar_i^2 ,   jar = J x - aref

(the MuJoCo soft-constraint primal; all rows in the reference's model
envelope — limits and pyramidal contacts — are one-sided). The reference
trains with CG at iterations=8, ls_iterations=8
(brax_rodent_run_ppo.py:52-53); Newton covers the `solver="newton"` flag
(brax_rodent_run_ppo.py:34).

TPU notes: fixed-size efc arrays, `lax.while_loop` with a static iteration
bound, exact line search via Newton steps on the convex scalar derivative
(no bracketing/branching), everything batched under vmap. The inner products
J@x / J^T f are (nefc, nv) matmuls that map onto the MXU over the env batch.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.physics import smooth
from brax_rodent_run_tpu.physics.constraint import (
    dense_efc_J, efc_layout, efc_matvec, efc_rmatvec)
from brax_rodent_run_tpu.physics.types import Data, Model, SolverType


def _unroll() -> bool:
  """Unroll the outer solver iteration only where it pays: on TPU the
  unrolled body lets XLA fuse/overlap trips (and the hot path is the
  Pallas kernel anyway); on CPU (tests, dry-runs) the 8x-duplicated
  graph just multiplies compile time, so use lax.while_loop there.
  Identical numerics either way: masked trips discard their values."""
  return jax.default_backend() != "cpu"


class _Ctx(NamedTuple):
  x: jax.Array        # (nv,) current qacc
  jar: jax.Array      # (nefc,) J x - aref
  grad: jax.Array     # (nv,)
  Mgrad: jax.Array    # (nv,) M^{-1} grad (CG) or H^{-1} grad (Newton)
  search: jax.Array   # (nv,) search direction
  cost: jax.Array     # ()
  prev_cost: jax.Array
  it: jax.Array       # () int
  done: jax.Array     # () bool








def _cg_core(m: Model, con_Jbase, qM, qMinv, efc_D, efc_aref,
             qacc_smooth):
  """Unbatched CG solve over the primal problem; pure function of the
  arrays the solve consumes (the Pallas kernel mirrors this exactly)."""

  def matvec(x):
    return efc_matvec(m, con_Jbase, x)

  def rmatvec(f):
    return efc_rmatvec(m, con_Jbase, f)

  def cost(x, jar):
    dterm = jnp.where(jar < 0, efc_D, 0.0)
    dx = x - qacc_smooth
    gauss = 0.5 * dx @ (qM @ dx)
    return gauss + 0.5 * jnp.sum(dterm * jar * jar), dterm

  def grad_fn(x, jar, dterm):
    return qM @ (x - qacc_smooth) + rmatvec(dterm * jar)

  def linesearch(x, jar, p):
    Jp = matvec(p)
    pMp = p @ (qM @ p)
    pMdx = p @ (qM @ (x - qacc_smooth))

    def dphi(alpha):
      j = jar + alpha * Jp
      dterm = jnp.where(j < 0, efc_D, 0.0)
      g = pMdx + alpha * pMp + jnp.sum(dterm * j * Jp)
      h = pMp + jnp.sum(dterm * Jp * Jp)
      return g, h

    g0, h0 = dphi(0.0)
    alpha = -g0 / jnp.maximum(h0, 1e-15)

    def body(_, alpha):
      g, h = dphi(alpha)
      return alpha - g / jnp.maximum(h, 1e-15)

    n_ls = max(m.opt.ls_iterations - 1, 0)
    if n_ls <= 16:
      for i in range(n_ls):
        alpha = body(i, alpha)
    else:
      alpha = jax.lax.fori_loop(0, n_ls, body, alpha)
    return alpha, Jp

  x0 = qacc_smooth
  jar0 = matvec(x0) - efc_aref
  cost0, dterm0 = cost(x0, jar0)
  grad0 = grad_fn(x0, jar0, dterm0)
  Mgrad0 = qMinv @ grad0
  ctx = _Ctx(x=x0, jar=jar0, grad=grad0, Mgrad=Mgrad0, search=-Mgrad0,
             cost=cost0, prev_cost=jnp.inf,
             it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

  tol = m.opt.tolerance * float(max(m.nv, 1))

  def cond(c: _Ctx):
    return (c.it < m.opt.iterations) & ~c.done

  def body(c: _Ctx):
    alpha, Jp = linesearch(c.x, c.jar, c.search)
    x = c.x + alpha * c.search
    jar = c.jar + alpha * Jp
    cst, dterm = cost(x, jar)
    grad = grad_fn(x, jar, dterm)
    Mgrad = qMinv @ grad
    # Polak-Ribiere+ with M-inner products
    num = grad @ Mgrad - c.grad @ Mgrad
    den = jnp.maximum(c.grad @ c.Mgrad, 1e-15)
    beta = jnp.maximum(0.0, num / den)
    search = -Mgrad + beta * c.search
    improvement = c.cost - cst
    done = improvement < tol
    return _Ctx(x=x, jar=jar, grad=grad, Mgrad=Mgrad, search=search,
                cost=cst, prev_cost=c.cost, it=c.it + 1, done=done)

  if m.opt.iterations <= 16 and _unroll():
    # unroll with done-masking: identical semantics to the while_loop,
    # but XLA can fuse/overlap instead of a serial loop per trip
    out = ctx
    for _ in range(m.opt.iterations):
      new = body(out)
      keep = out.done
      out = jax.tree_util.tree_map(
          lambda a, b: jnp.where(keep, a, b), out, new)
  else:
    out = jax.lax.while_loop(cond, body, ctx)

  dterm = jnp.where(out.jar < 0, efc_D, 0.0)
  efc_force = -dterm * out.jar
  qfrc_constraint = rmatvec(efc_force)
  return out.x, efc_force, qfrc_constraint, out.it


@functools.lru_cache(maxsize=32)
def _cg_entry(m: Model):
  """custom-vmap CG entry: per-env XLA core unbatched; the fused Pallas
  kernel when vmapped over the env batch on TPU f32."""

  @jax.custom_batching.custom_vmap
  def cg(con_Jbase, qM, qMinv, efc_D, efc_aref, qacc_smooth):
    return _cg_core(m, con_Jbase, qM, qMinv, efc_D, efc_aref,
                    qacc_smooth)[:3]

  @cg.def_vmap
  def _cg_vmap(axis_size, in_batched, *args):
    del axis_size
    from brax_rodent_run_tpu.ops import cg as cg_ops
    use_kernel = (cg_ops.FORCE_INTERPRET
                  or (jax.default_backend() == "tpu"
                      and args[1].dtype == jnp.float32
                      and m.opt.iterations <= 16))
    if use_kernel and all(in_batched) and args[1].ndim == 3:
      out = cg_ops.cg_solve_batched(m, *args)
    else:
      out = jax.vmap(lambda *a: _cg_core(m, *a)[:3])(*args)
    return out, (True, True, True)

  return cg


def _newton_iters(m: Model, d: Data, improvement_scale) -> Data:
  x0 = d.qacc_smooth
  jar0 = efc_matvec(m, d.con_Jbase, x0) - d.efc_aref
  cost0, dterm0 = _newton_cost(m, d, x0, jar0)
  grad0 = _newton_grad(m, d, x0, jar0, dterm0)

  J_dense = dense_efc_J(m, d)

  def precond(grad, dterm):
    from brax_rodent_run_tpu.ops.cholesky import spd_inverse
    JDJ = (J_dense * dterm[:, None]).T @ J_dense
    H = d.qM + JDJ
    return spd_inverse(H) @ grad

  def cost(x, jar):
    return _newton_cost(m, d, x, jar)

  def linesearch(x, jar, p):
    Jp = efc_matvec(m, d.con_Jbase, p)
    pMp = p @ (d.qM @ p)
    pMdx = p @ (d.qM @ (x - d.qacc_smooth))

    def dphi(alpha):
      j = jar + alpha * Jp
      dterm = jnp.where(j < 0, d.efc_D, 0.0)
      g = pMdx + alpha * pMp + jnp.sum(dterm * j * Jp)
      h = pMp + jnp.sum(dterm * Jp * Jp)
      return g, h

    g0, h0 = dphi(0.0)
    alpha = -g0 / jnp.maximum(h0, 1e-15)
    n_ls = max(m.opt.ls_iterations - 1, 0)

    def body(_, alpha):
      g, h = dphi(alpha)
      return alpha - g / jnp.maximum(h, 1e-15)

    if n_ls <= 16:
      for i in range(n_ls):
        alpha = body(i, alpha)
    else:
      alpha = jax.lax.fori_loop(0, n_ls, body, alpha)
    return alpha, Jp

  Mgrad0 = precond(grad0, dterm0)
  ctx = _Ctx(x=x0, jar=jar0, grad=grad0, Mgrad=Mgrad0, search=-Mgrad0,
             cost=cost0, prev_cost=jnp.inf,
             it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))
  tol = m.opt.tolerance * improvement_scale

  def cond(c: _Ctx):
    return (c.it < m.opt.iterations) & ~c.done

  def body(c: _Ctx):
    alpha, Jp = linesearch(c.x, c.jar, c.search)
    x = c.x + alpha * c.search
    jar = c.jar + alpha * Jp
    cst, dterm = cost(x, jar)
    grad = _newton_grad(m, d, x, jar, dterm)
    Mgrad = precond(grad, dterm)
    search = -Mgrad
    improvement = c.cost - cst
    done = improvement < tol
    return _Ctx(x=x, jar=jar, grad=grad, Mgrad=Mgrad, search=search,
                cost=cst, prev_cost=c.cost, it=c.it + 1, done=done)

  if m.opt.iterations <= 16 and _unroll():
    out = ctx
    for _ in range(m.opt.iterations):
      new = body(out)
      keep = out.done
      out = jax.tree_util.tree_map(
          lambda a, b: jnp.where(keep, a, b), out, new)
  else:
    out = jax.lax.while_loop(cond, body, ctx)

  dterm = jnp.where(out.jar < 0, d.efc_D, 0.0)
  efc_force = -dterm * out.jar
  qfrc_constraint = efc_rmatvec(m, d.con_Jbase, efc_force)
  return d.replace(qacc=out.x, efc_force=efc_force,
                   qfrc_constraint=qfrc_constraint, solver_niter=out.it)


def _newton_cost(m: Model, d: Data, x, jar):
  dterm = jnp.where(jar < 0, d.efc_D, 0.0)
  dx = x - d.qacc_smooth
  gauss = 0.5 * dx @ (d.qM @ dx)
  return gauss + 0.5 * jnp.sum(dterm * jar * jar), dterm


def _newton_grad(m: Model, d: Data, x, jar, dterm):
  return d.qM @ (x - d.qacc_smooth) + efc_rmatvec(m, d.con_Jbase,
                                                  dterm * jar)


def solve(m: Model, d: Data) -> Data:
  """Dispatch on m.opt.solver; no-constraint models shortcut to smooth."""
  if efc_layout(m).nefc == 0:
    return d.replace(qacc=d.qacc_smooth,
                     qfrc_constraint=jnp.zeros(m.nv, d.qpos.dtype))
  if m.opt.solver == SolverType.NEWTON:
    return _newton_iters(m, d, float(max(m.nv, 1)))
  qacc, efc_force, qfrc = _cg_entry(m)(
      d.con_Jbase, d.qM, d.qMinv, d.efc_D, d.efc_aref, d.qacc_smooth)
  return d.replace(qacc=qacc, efc_force=efc_force,
                   qfrc_constraint=qfrc,
                   solver_niter=jnp.asarray(m.opt.iterations, jnp.int32))
