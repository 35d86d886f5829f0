"""Pallas ops: batched SPD Cholesky kernel vs jax.scipy (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.ops import cholesky as chol_mod


@pytest.mark.parametrize("B,n", [(128, 73), (256, 16), (300, 73)])
def test_cholesky_kernel_matches_xla(B, n):
  key = jax.random.PRNGKey(0)
  A = jax.random.normal(key, (B, n, n), jnp.float32)
  M = jnp.einsum("bij,bkj->bik", A, A) + n * jnp.eye(n, dtype=jnp.float32)

  ref = jax.scipy.linalg.cholesky(M, lower=True)
  chol_mod.FORCE_INTERPRET = True
  try:
    out = chol_mod.cholesky_batched(M)
  finally:
    chol_mod.FORCE_INTERPRET = False

  assert out.shape == M.shape
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=2e-4, atol=2e-4)
  # strictly lower-triangular output
  assert np.allclose(np.triu(np.asarray(out), 1), 0.0)


def test_spd_cholesky_vmap_dispatch():
  """vmap over the public entry produces the same factor as per-matrix
  jax.scipy (fallback path on CPU; kernel path covered above)."""
  key = jax.random.PRNGKey(1)
  A = jax.random.normal(key, (8, 12, 12), jnp.float64)
  M = jnp.einsum("bij,bkj->bik", A, A) + 12 * jnp.eye(12, dtype=jnp.float64)
  out = jax.vmap(chol_mod.spd_cholesky)(M)
  ref = jax.scipy.linalg.cholesky(M, lower=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)

  # unbatched call
  out1 = chol_mod.spd_cholesky(M[0])
  np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[0]),
                             atol=1e-10)


@pytest.mark.parametrize("B,n", [(128, 73), (200, 24)])
def test_inverse_kernel_matches_xla(B, n):
  key = jax.random.PRNGKey(2)
  A = jax.random.normal(key, (B, n, n), jnp.float32)
  M = jnp.einsum("bij,bkj->bik", A, A) + n * jnp.eye(n, dtype=jnp.float32)
  ref = jnp.linalg.inv(M)
  chol_mod.FORCE_INTERPRET = True
  try:
    out = chol_mod.inverse_batched(M)
  finally:
    chol_mod.FORCE_INTERPRET = False
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=3e-3, atol=2e-4)


def test_spd_inverse_vmap_dispatch():
  key = jax.random.PRNGKey(3)
  A = jax.random.normal(key, (6, 10, 10), jnp.float64)
  M = jnp.einsum("bij,bkj->bik", A, A) + 10 * jnp.eye(10, dtype=jnp.float64)
  out = jax.vmap(chol_mod.spd_inverse)(M)
  np.testing.assert_allclose(np.asarray(out), np.linalg.inv(np.asarray(M)),
                             atol=1e-10)
  out1 = chol_mod.spd_inverse(M[0])
  np.testing.assert_allclose(np.asarray(out1),
                             np.linalg.inv(np.asarray(M[0])), atol=1e-10)


def test_cg_kernel_matches_core():
  """Fused CG kernel (interpret mode) == vmapped XLA core on real
  constraint data from the mini model."""
  import mujoco
  from tests.test_sensor import _MINI_XML
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import cg as cg_ops
  from brax_rodent_run_tpu.physics import forward, solver
  from brax_rodent_run_tpu.physics.types import make_data

  mj_model = mujoco.MjModel.from_xml_string(_MINI_XML)
  mj_model.opt.jacobian = 0
  mj_model.opt.iterations = 8
  mj_model.opt.ls_iterations = 8
  m = from_mj_model(mj_model)

  B = 8
  key = jax.random.PRNGKey(0)
  d0 = make_data(m, dtype=jnp.float32)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(key, (B, m.nq), jnp.float32, -0.02, 0.02)
  qvel = jax.random.uniform(key, (B, m.nv), jnp.float32, -0.5, 0.5)
  batch = jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)
  batch = jax.jit(jax.vmap(lambda d: forward.forward(m, d)))(batch)
  assert bool(jnp.any(batch.efc_active)), "no active rows; vacuous"

  args = (batch.con_Jbase, batch.qM, batch.qMinv, batch.efc_D,
          batch.efc_aref, batch.qacc_smooth)
  ref = jax.vmap(lambda *a: solver._cg_core(m, *a)[:3])(*args)
  cg_ops.FORCE_INTERPRET = True
  try:
    out = cg_ops.cg_solve_batched(m, *args)
  finally:
    cg_ops.FORCE_INTERPRET = False
  for name, a, b in zip(("qacc", "force", "qfrc"), out, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3, err_msg=name)
