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

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.physics import smooth
from brax_rodent_run_tpu.physics.types import Data, Model, SolverType


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


def _cost(m: Model, d: Data, x, jar):
  dterm = jnp.where(jar < 0, d.efc_D, 0.0)
  dx = x - d.qacc_smooth
  gauss = 0.5 * dx @ (d.qM @ dx)
  return gauss + 0.5 * jnp.sum(dterm * jar * jar), dterm


def _grad(m: Model, d: Data, x, jar, dterm):
  return d.qM @ (x - d.qacc_smooth) + d.efc_J.T @ (dterm * jar)


def _linesearch(m: Model, d: Data, x, jar, p):
  """Exact line search on the convex piecewise quadratic along p.

  phi'(alpha) is piecewise linear & nondecreasing; Newton iterations on it
  converge monotonically — run ls_iterations of them, branch-free.
  """
  Jp = d.efc_J @ p                       # (nefc,)
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

  def body(_, alpha):
    g, h = dphi(alpha)
    return alpha - g / jnp.maximum(h, 1e-15)

  alpha = jax.lax.fori_loop(0, max(m.opt.ls_iterations - 1, 0), body, alpha)
  return alpha, Jp


def _solve_iters(m: Model, d: Data, improvement_scale, newton: bool) -> Data:
  nefc = d.efc_J.shape[0]

  x0 = d.qacc_smooth
  jar0 = d.efc_J @ x0 - d.efc_aref
  cost0, dterm0 = _cost(m, d, x0, jar0)
  grad0 = _grad(m, d, x0, jar0, dterm0)

  def precond(grad, dterm):
    if newton:
      JDJ = (d.efc_J * dterm[:, None]).T @ d.efc_J
      H = d.qM + JDJ
      L = jax.scipy.linalg.cholesky(H, lower=True)
      return jax.scipy.linalg.cho_solve((L, True), grad[:, None])[:, 0]
    return smooth.solve_m(m, d, grad)

  Mgrad0 = precond(grad0, dterm0)
  ctx = _Ctx(x=x0, jar=jar0, grad=grad0, Mgrad=Mgrad0, search=-Mgrad0,
             cost=cost0, prev_cost=jnp.inf,
             it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

  tol = m.opt.tolerance * improvement_scale

  def cond(c: _Ctx):
    return (c.it < m.opt.iterations) & ~c.done

  def body(c: _Ctx):
    alpha, Jp = _linesearch(m, d, c.x, c.jar, c.search)
    x = c.x + alpha * c.search
    jar = c.jar + alpha * Jp
    cost, dterm = _cost(m, d, x, jar)
    grad = _grad(m, d, x, jar, dterm)
    Mgrad = precond(grad, dterm)
    if newton:
      search = -Mgrad
    else:
      # Polak-Ribiere+ with M-inner products
      num = grad @ Mgrad - c.grad @ Mgrad
      den = jnp.maximum(c.grad @ c.Mgrad, 1e-15)
      beta = jnp.maximum(0.0, num / den)
      search = -Mgrad + beta * c.search
    improvement = c.cost - cost
    done = improvement < tol
    return _Ctx(x=x, jar=jar, grad=grad, Mgrad=Mgrad, search=search,
                cost=cost, prev_cost=c.cost, it=c.it + 1, done=done)

  out = jax.lax.while_loop(cond, body, ctx)

  dterm = jnp.where(out.jar < 0, d.efc_D, 0.0)
  efc_force = -dterm * out.jar
  qfrc_constraint = d.efc_J.T @ efc_force
  return d.replace(qacc=out.x, efc_force=efc_force,
                   qfrc_constraint=qfrc_constraint, solver_niter=out.it)


def solve(m: Model, d: Data) -> Data:
  """Dispatch on m.opt.solver; no-constraint models shortcut to smooth."""
  if d.efc_J.shape[0] == 0:
    return d.replace(qacc=d.qacc_smooth,
                     qfrc_constraint=jnp.zeros(m.nv, d.qpos.dtype))
  # improvement scale: MuJoCo uses meaninertia * max(1, nv)
  scale = float(max(m.nv, 1))
  newton = m.opt.solver == SolverType.NEWTON
  return _solve_iters(m, d, scale, newton)
