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


# mini model for the fused-dynamics kernel: needs contacts AND joint
# limits (eligibility requires both row families) plus damping so the
# implicit-euler branch is exercised.
_FUSED_XML = """
<mujoco>
  <option timestep="0.002" solver="CG" iterations="8" ls_iterations="8"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" contype="1" conaffinity="1"/>
    <body name="box" pos="0 0 0.06">
      <freejoint/>
      <geom name="bgeom" type="box" size="0.05 0.05 0.05" density="800"
            contype="1" conaffinity="1"/>
      <body name="arm" pos="0 0 0.05">
        <joint name="swing" type="hinge" axis="0 1 0" damping="0.01"
               limited="true" range="-30 30"/>
        <geom name="ageom" type="capsule" size="0.01" fromto="0 0 0 0 0 0.1"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="swing" gear="0.2"/></actuator>
</mujoco>
"""


def _fused_model():
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  mj_model = mujoco.MjModel.from_xml_string(_FUSED_XML)
  mj_model.opt.jacobian = 0
  return from_mj_model(mj_model)


def test_fused_kernel_matches_core(monkeypatch):
  """Fused implicit-dynamics kernel (interpret mode) == vmapped XLA core
  (_core = exact stage composition) on real pipeline data."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused as fused_mod
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = _fused_model()
  assert fused_mod.eligible(m), "mini model should be fused-eligible"

  B = 8
  key = jax.random.PRNGKey(0)
  d0 = make_data(m, dtype=jnp.float32)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(key, (B, m.nq), jnp.float32, -0.02, 0.02)
  qvel = jax.random.uniform(key, (B, m.nv), jnp.float32, -0.5, 0.5)
  batch = jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)
  batch = jax.jit(jax.vmap(lambda d: forward.forward(m, d)))(batch)
  assert bool(jnp.any(batch.efc_active)), "no active rows; vacuous"

  qfrc_smooth = (batch.qfrc_passive - batch.qfrc_bias
                 + batch.qfrc_actuator + batch.qfrc_applied)
  args = (batch.qpos, batch.qvel, batch.cinert, batch.cdof, qfrc_smooth,
          batch.contact.dist, batch.contact.pos, batch.contact.frame,
          batch.subtree_com)
  ref = jax.vmap(lambda *a: fused_mod._core(m, *a))(*args)
  fused_mod.FORCE_INTERPRET = True
  try:
    out = fused_mod.fused_batched(m, *args)
  finally:
    fused_mod.FORCE_INTERPRET = False
  names = ("qacc", "qacc_smooth", "qfrc_constraint", "efc_force",
           "qvel_new")
  for name, a, b in zip(names, out, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3, err_msg=name)


def test_fused_core_matches_pipeline():
  """_core's outputs equal the unfused forward() pipeline's fields, so
  the fused substep preserves step() semantics wherever it is enabled."""
  from brax_rodent_run_tpu.ops import fused as fused_mod
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = _fused_model()

  d0 = make_data(m, dtype=jnp.float32)
  key = jax.random.PRNGKey(3)
  d0 = d0.replace(
      qpos=jnp.asarray(m.qpos0, jnp.float32)
      + jax.random.uniform(key, (m.nq,), jnp.float32, -0.02, 0.02),
      qvel=jax.random.uniform(key, (m.nv,), jnp.float32, -0.5, 0.5))
  df = jax.jit(lambda d: forward.forward(m, d))(d0)
  de = jax.jit(lambda d: forward.euler(m, d))(df)

  qfrc_smooth = (df.qfrc_passive - df.qfrc_bias + df.qfrc_actuator
                 + df.qfrc_applied)
  out = jax.jit(lambda *a: fused_mod._core(m, *a))(
      df.qpos, df.qvel, df.cinert, df.cdof, qfrc_smooth,
      df.contact.dist, df.contact.pos, df.contact.frame, df.subtree_com)
  qacc, qacc_smooth, qfrc_constraint, efc_force, qvel_new = out
  np.testing.assert_allclose(np.asarray(qacc), np.asarray(df.qacc),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(qacc_smooth), np.asarray(df.qacc_smooth),
      rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(
      np.asarray(qfrc_constraint), np.asarray(df.qfrc_constraint),
      rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(efc_force),
                             np.asarray(df.efc_force),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(qvel_new), np.asarray(de.qvel),
                             rtol=1e-5, atol=1e-5)


_FUSED2_XML = _FUSED_XML.replace(
    "<actuator><motor joint=\"swing\" gear=\"0.2\"/></actuator>",
    """<actuator>
      <motor joint="swing" gear="0.2"/>
      <general joint="swing" gear="0.3" dyntype="filter" dynprm="0.01"
               gaintype="fixed" gainprm="5 0 0" biastype="affine"
               biasprm="0 -1 -0.1" ctrlrange="-1 1" ctrllimited="true"
               forcerange="-10 10" forcelimited="true"/>
    </actuator>""")


def _fused2_model():
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  mj_model = mujoco.MjModel.from_xml_string(_FUSED2_XML)
  mj_model.opt.jacobian = 0
  return from_mj_model(mj_model)


def _fused2_batch(m, B=8):
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data
  key = jax.random.PRNGKey(0)
  k1, k2, k3 = jax.random.split(key, 3)
  d0 = make_data(m, dtype=jnp.float32)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(k1, (B, m.nq), jnp.float32, -0.02, 0.02)
  qvel = jax.random.uniform(k2, (B, m.nv), jnp.float32, -0.5, 0.5)
  ctrl = jax.random.uniform(k3, (B, m.nu), jnp.float32, -1.5, 1.5)
  act = jax.random.uniform(k3, (B, m.na), jnp.float32, -0.3, 0.3)
  batch = jax.vmap(
      lambda q, v, c, a: d0.replace(qpos=q, qvel=v, ctrl=c, act=a))(
          qpos, qvel, ctrl, act)
  batch = jax.jit(jax.vmap(lambda d: forward.forward(m, d)))(batch)
  assert bool(jnp.any(batch.efc_active)), "no active rows; vacuous"
  return batch


_FF_NAMES = ("subtree_com", "cinert", "cdof", "cvel", "cdof_dot",
             "qfrc_bias", "qfrc_spring", "qfrc_damper", "qfrc_passive",
             "actuator_length", "actuator_velocity", "actuator_force",
             "act_dot", "qfrc_actuator", "qfrc_smooth", "qacc_smooth",
             "qacc", "qfrc_constraint", "efc_force",
             "qpos_new", "qvel_new", "act_new")


def test_fused_full_kernel_matches_core(monkeypatch):
  """Full-dynamics kernel (interpret mode) == vmapped XLA stage
  composition on real pipeline data (limits + contacts + filter and
  motor actuators + free joint + implicit damping)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused2_model()
  assert ff.eligible_full(m), "mini model should be v2-eligible"
  batch = _fused2_batch(m)

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied, batch.xpos, batch.xmat, batch.xipos,
          batch.ximat, batch.xanchor, batch.xaxis,
          batch.contact.dist, batch.contact.pos, batch.contact.frame)
  ref = jax.vmap(lambda *a: ff._core(m, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_full_batched(m, *args)
  finally:
    ff.FORCE_INTERPRET = False
  assert len(out) == len(ref) == len(_FF_NAMES)
  for name, a, b in zip(_FF_NAMES, out, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3, err_msg=name)


def test_fused_full_core_matches_pipeline():
  """v2 _core's outputs equal the unfused forward()+euler() fields, so
  step_fused_full preserves step() semantics where enabled."""
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = _fused2_model()
  d0 = make_data(m, dtype=jnp.float32)
  key = jax.random.PRNGKey(7)
  k1, k2, k3 = jax.random.split(key, 3)
  d0 = d0.replace(
      qpos=jnp.asarray(m.qpos0, jnp.float32)
      + jax.random.uniform(k1, (m.nq,), jnp.float32, -0.02, 0.02),
      qvel=jax.random.uniform(k2, (m.nv,), jnp.float32, -0.5, 0.5),
      ctrl=jax.random.uniform(k3, (m.nu,), jnp.float32, -1.5, 1.5))
  df = jax.jit(lambda d: forward.forward(m, d))(d0)
  de = jax.jit(lambda d: forward.euler(m, d))(df)

  out = jax.jit(lambda *a: ff._core(m, *a))(
      df.qpos, df.qvel, df.act, df.ctrl, df.qfrc_applied,
      df.xpos, df.xmat, df.xipos, df.ximat, df.xanchor, df.xaxis,
      df.contact.dist, df.contact.pos, df.contact.frame)
  want = (df.subtree_com, df.cinert, df.cdof, df.cvel, df.cdof_dot,
          df.qfrc_bias, df.qfrc_spring, df.qfrc_damper, df.qfrc_passive,
          df.actuator_length, df.actuator_velocity, df.actuator_force,
          df.act_dot, df.qfrc_actuator, df.qfrc_smooth, df.qacc_smooth,
          df.qacc, df.qfrc_constraint, df.efc_force,
          de.qpos, de.qvel, de.act)
  for name, a, b in zip(_FF_NAMES, out, want):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("name", ["rodent_new.xml", "humanoid.xml"])
def test_fk_kernel_matches_stage(name):
  """In-kernel FK emitter (interpret mode) == smooth.kinematics."""
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import fk as fk_mod
  from brax_rodent_run_tpu.physics import smooth
  from brax_rodent_run_tpu.physics.types import make_data

  m = from_mj_model(mujoco.MjModel.from_xml_path(model_path(name)))
  B = 128
  key = jax.random.PRNGKey(0)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(key, (B, m.nq), jnp.float32, -0.2, 0.2)

  d0 = make_data(m, dtype=jnp.float32)
  ref = jax.jit(jax.vmap(
      lambda q: smooth.kinematics(m, d0.replace(qpos=q))))(qpos)

  out = fk_mod.fk_test_kernel(m, interpret=True)(
      jnp.transpose(qpos))
  nb, njp = m.nbody, max(m.njnt, 1)

  def unpack(y, ncomp, n):
    return jnp.swapaxes(
        jnp.moveaxis(y, -1, 0).reshape(B, ncomp, n), -1, -2)

  xpos = unpack(out[0], 3, nb)
  xquat = unpack(out[1], 4, nb)
  xanchor = unpack(out[2], 3, njp)[:, :m.njnt]
  xaxis = unpack(out[3], 3, njp)[:, :m.njnt]
  np.testing.assert_allclose(np.asarray(xpos), np.asarray(ref.xpos),
                             rtol=1e-4, atol=1e-5, err_msg="xpos")
  np.testing.assert_allclose(np.asarray(xquat), np.asarray(ref.xquat),
                             rtol=1e-4, atol=1e-5, err_msg="xquat")
  np.testing.assert_allclose(np.asarray(xanchor), np.asarray(ref.xanchor),
                             rtol=1e-4, atol=1e-5, err_msg="xanchor")
  np.testing.assert_allclose(np.asarray(xaxis), np.asarray(ref.xaxis),
                             rtol=1e-4, atol=1e-5, err_msg="xaxis")


@pytest.mark.parametrize("name", ["rodent_new.xml", "humanoid.xml"])
def test_collision_kernel_matches_stage(name):
  """In-kernel FK + narrow-phase emitters (interpret) == kinematics +
  collision stages."""
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import coll as coll_mod
  from brax_rodent_run_tpu.physics import collision, smooth
  from brax_rodent_run_tpu.physics.types import make_data

  m = from_mj_model(mujoco.MjModel.from_xml_path(model_path(name)))
  assert coll_mod.collision_supported(m)
  B = 128
  key = jax.random.PRNGKey(1)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(key, (B, m.nq), jnp.float32, -0.1, 0.1)

  d0 = make_data(m, dtype=jnp.float32)
  ref = jax.jit(jax.vmap(lambda q: collision.collision(
      m, smooth.kinematics(m, d0.replace(qpos=q)))))(qpos)

  out = coll_mod.coll_test_kernel(m, interpret=True)(jnp.transpose(qpos))
  ncon = m.ncon_max
  cdist = jnp.moveaxis(out[0], -1, 0)
  cpos = jnp.swapaxes(jnp.moveaxis(out[1], -1, 0).reshape(B, 3, ncon),
                      -1, -2)
  # frame comps k of rows (c, d) -> (B, ncon, d, k)
  fr = jnp.moveaxis(out[2], -1, 0).reshape(B, 3, ncon, 3)
  fr = jnp.transpose(fr, (0, 2, 3, 1))
  np.testing.assert_allclose(np.asarray(cdist),
                             np.asarray(ref.contact.dist),
                             rtol=1e-4, atol=1e-5, err_msg="dist")
  np.testing.assert_allclose(np.asarray(cpos),
                             np.asarray(ref.contact.pos),
                             rtol=1e-4, atol=1e-5, err_msg="pos")
  np.testing.assert_allclose(np.asarray(fr),
                             np.asarray(ref.contact.frame),
                             rtol=1e-4, atol=1e-5, err_msg="frame")


_FUSED3_XML = _FUSED2_XML.replace(
    '<geom name="bgeom" type="box" size="0.05 0.05 0.05" density="800"',
    '<geom name="bgeom" type="sphere" size="0.05" density="800"')


# TWO free-floating kinematic trees (rodent_pair.xml shape, VERDICT.md r1
# #10): exercises the multi-free-joint paths — per-slot FK free gathers,
# stacked PFREE cdof rows, per-joint quaternion integration
_PAIR_XML = """
<mujoco>
  <option timestep="0.002" solver="CG" iterations="8" ls_iterations="8"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" contype="2" conaffinity="1"/>
    <body name="boxA" pos="0 0 0.06">
      <freejoint/>
      <geom name="geomA" type="sphere" size="0.05" density="800"
            contype="1" conaffinity="2"/>
      <body name="armA" pos="0 0 0.05">
        <joint name="swingA" type="hinge" axis="0 1 0" damping="0.01"
               limited="true" range="-30 30"/>
        <geom name="ageomA" type="capsule" size="0.01" fromto="0 0 0 0 0 0.1"
              contype="0" conaffinity="0"/>
      </body>
    </body>
    <body name="boxB" pos="0.3 0.1 0.07">
      <freejoint/>
      <geom name="geomB" type="sphere" size="0.05" density="700"
            contype="1" conaffinity="2"/>
      <body name="armB" pos="0 0 0.05">
        <joint name="swingB" type="hinge" axis="1 0 0" damping="0.02"
               limited="true" range="-45 45"/>
        <geom name="ageomB" type="capsule" size="0.01" fromto="0 0 0 0 0.1 0"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="swingA" gear="0.2"/>
    <general joint="swingB" gear="0.3" dyntype="filter" dynprm="0.01"
             gaintype="fixed" gainprm="5 0 0" biastype="affine"
             biasprm="0 -1 -0.1" ctrlrange="-1 1" ctrllimited="true"
             forcerange="-10 10" forcelimited="true"/>
  </actuator>
</mujoco>
"""


def _pair_model():
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  mj_model = mujoco.MjModel.from_xml_string(_PAIR_XML)
  mj_model.opt.jacobian = 0
  return from_mj_model(mj_model)


def test_fused_full_kernel_matches_core_two_free(monkeypatch):
  """v2 kernel parity on a TWO-free-joint model (multi-free cdof rows +
  per-joint quat integration)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _pair_model()
  assert ff.eligible_full(m), "pair mini model should be v2-eligible"
  assert len(ff.statics2(m).free_js) == 2
  batch = _fused2_batch(m)

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied, batch.xpos, batch.xmat, batch.xipos,
          batch.ximat, batch.xanchor, batch.xaxis,
          batch.contact.dist, batch.contact.pos, batch.contact.frame)
  ref = jax.vmap(lambda *a: ff._core(m, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_full_batched(m, *args)
  finally:
    ff.FORCE_INTERPRET = False
  for name, a, b in zip(_FF_NAMES, out, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3, err_msg=name)


def test_pipeline_steps_fused_lean_matches_full(monkeypatch):
  """lean=True must agree with the full path on every field the envs
  consume: final state (qpos/qvel/act), kernel outputs feeding obs
  (cinert/cvel/qfrc_actuator/subtree_com) and body-1 frame (xpos/xmat
  from the free quaternion vs the full kinematics reconstruction)."""
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  m = _fused3_model()
  batch = _fused2_batch(m, B=4)
  n_frames = 2
  fb = ff.statics2(m).fbodies[0]

  def run(lean):
    def one(q, v, a, c, qf):
      d = make_data(m, dtype=jnp.float32)
      d = d.replace(qpos=q, qvel=v, act=a, ctrl=c, qfrc_applied=qf)
      return forward.pipeline_steps_fused(m, d, n_frames, lean=lean)
    return jax.jit(jax.vmap(one))(batch.qpos, batch.qvel, batch.act,
                                  batch.ctrl, batch.qfrc_applied)

  full = run(False)
  lean = run(True)
  for name in ("qpos", "qvel", "act", "cinert", "cvel", "qfrc_actuator",
               "subtree_com", "time"):
    np.testing.assert_allclose(
        np.asarray(getattr(lean, name)), np.asarray(getattr(full, name)),
        rtol=1e-5, atol=1e-6, err_msg=name)
  np.testing.assert_allclose(np.asarray(lean.xpos[:, fb]),
                             np.asarray(full.xpos[:, fb]),
                             rtol=1e-5, atol=1e-6, err_msg="xpos[fb]")
  np.testing.assert_allclose(np.asarray(lean.xmat[:, fb]),
                             np.asarray(full.xmat[:, fb]),
                             rtol=1e-5, atol=1e-6, err_msg="xmat[fb]")


def test_fused_steps_kernel_lean_outputs(monkeypatch):
  """The lean v3 kernel (consumed-only HBM writes) must produce the
  same 8 outputs as the full core, in interpret mode (exercises the
  reduced out_rows write path, not just the XLA fallback)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 2

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  full = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ref = tuple(full[i] for i in ff._LEAN_SEL)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args, lean=True)
  finally:
    ff.FORCE_INTERPRET = False
  names = ("subtree_com", "cinert", "cvel", "qfrc_actuator",
           "qpos_new", "qvel_new", "act_new", "qpos_pre")
  assert len(out) == len(ref) == 8
  for name, a, b in zip(names, out, ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-3, atol=5e-3, err_msg=name)


def test_fused_steps_kernel_matches_core_two_free(monkeypatch):
  """v3 whole-control-step kernel parity (in-kernel FK with two free
  joints in the same level slot) on the pair mini model."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _pair_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 3

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
  names = _FF_NAMES + ("qpos_pre", "con_dist", "con_pos", "con_frame")
  for name, a, b in zip(names, out, ref):
    a, b = np.asarray(a), np.asarray(b)
    if name == "con_dist":
      a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)


def _fused3_model():
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  mj_model = mujoco.MjModel.from_xml_string(_FUSED3_XML)
  mj_model.opt.jacobian = 0
  return from_mj_model(mj_model)


def test_fused_steps_kernel_matches_core(monkeypatch):
  """v3 whole-control-step kernel (interpret, n_frames=3 in-kernel
  loop) == n_frames stage-pipeline substeps. Mini model uses a sphere
  body (plane-box is outside the v3 narrow-phase envelope; the
  plane-capsule/ellipsoid paths are covered on the real models by
  test_collision_kernel_matches_stage)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 3

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
  names = _FF_NAMES + ("qpos_pre", "con_dist", "con_pos", "con_frame")
  assert len(out) == len(ref) == len(names)
  for name, a, b in zip(names, out, ref):
    a, b = np.asarray(a), np.asarray(b)
    if name == "con_dist":
      # inactive slots: stage keeps 1e10, kernel layout too — compare
      # with a cap so the sentinel doesn't swamp the tolerance
      a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)


def test_fused_steps_kernel_lanes256(monkeypatch):
  """BRR_FF_LANES=256 (the tpu_sweep.sh latency experiment: half the
  serial grid blocks, 2x lanes per instruction) must be semantics-
  preserving. _LANES is read at kernel/const build time, so flip the
  module constant and clear every lanes-dependent builder cache."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 2

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)

  def _clear_lane_caches():
    ff._build_consts.cache_clear()
    ff._kernel.cache_clear()
    ff._kernel_steps.cache_clear()

  monkeypatch.setattr(ff, "_LANES", 256)
  _clear_lane_caches()
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
    monkeypatch.undo()
    _clear_lane_caches()
  names = _FF_NAMES + ("qpos_pre", "con_dist", "con_pos", "con_frame")
  for name, a, b in zip(names, out, ref):
    a, b = np.asarray(a), np.asarray(b)
    if name == "con_dist":
      a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)


def test_fused_steps_kernel_chol_split(monkeypatch):
  """BRR_CHOL_SPLIT=1 (two sequential factor+inverse passes instead of
  the paired doubled-lane pass) must stay semantics-identical — it is
  the A/B + VMEM-relief fallback on models where 2E-wide factor
  scratches don't fit."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  monkeypatch.setenv("BRR_CHOL_SPLIT", "1")
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 2

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)

  def _clear():
    ff._kernel.cache_clear()
    ff._kernel_steps.cache_clear()

  _clear()
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
    monkeypatch.undo()
    _clear()
  names = _FF_NAMES + ("qpos_pre", "con_dist", "con_pos", "con_frame")
  for name, a, b in zip(names, out, ref):
    a, b = np.asarray(a), np.asarray(b)
    if name == "con_dist":
      a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)


def test_tree_sparse_cholesky_matches_dense_rodent():
  """The blocked kernel factor matches the XLA oracle on the REAL rodent
  mass matrix — and the factor provably FILLS outside the kinematic-tree
  ancestor pattern. The fill assertion pins why the shelved
  'tree-sparse Cholesky' lever is invalid in this formulation
  (parents-first lower Cholesky of a BRANCHED tree is not fill-free —
  eliminating the root couples its branches; capping trailing updates at
  the subtree extent produced 2.6e-3 factor errors when tried). The
  fill-free factorization is MuJoCo's leaf-first L^T D L with
  root-path (non-contiguous) update sets — see the note in
  ops/fused_full._emit_dynamics."""
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.physics import smooth
  from brax_rodent_run_tpu.physics.tree import masks
  from brax_rodent_run_tpu.physics.types import make_data

  m = from_mj_model(mujoco.MjModel.from_xml_path(
      model_path("rodent_new.xml")))
  d = make_data(m, dtype=jnp.float32)
  key = jax.random.PRNGKey(3)
  qpos = jnp.asarray(m.qpos0, jnp.float32) + jax.random.uniform(
      key, (m.nq,), jnp.float32, -0.1, 0.1)
  d = smooth.crb(m, smooth.com_pos(m, smooth.kinematics(
      m, d.replace(qpos=qpos))), factor=False)
  qM = jnp.asarray(d.qM, jnp.float32)[None]        # (1, nv, nv)
  B = 128
  jit_b = 1.0 + 0.01 * jnp.arange(B, dtype=jnp.float32)
  Mb = qM * jit_b[:, None, None]                   # SPD, tree pattern

  chol_mod.FORCE_INTERPRET = True
  try:
    L = chol_mod.cholesky_batched(Mb)
  finally:
    chol_mod.FORCE_INTERPRET = False
  ref = jax.scipy.linalg.cholesky(Mb, lower=True)
  np.testing.assert_allclose(np.asarray(L), np.asarray(ref),
                             rtol=2e-4, atol=2e-4, err_msg="oracle")

  # fill outside the ancestor pattern is real and sizable
  qmm = np.asarray(masks(m).qm_upper)              # [i,j]: i anc-of j
  pattern = ((qmm + qmm.T) > 0)                    # comparable dof pairs
  outside = np.tril(~pattern, -1)
  fill_mag = np.abs(np.asarray(L[0]))[outside]
  assert fill_mag.max() > 1e-4, (
      "expected Cholesky fill outside the tree pattern; if this ever "
      "becomes zero the tree-capped factorization would be valid")


@pytest.mark.slow
def test_fused_steps_kernel_rodent_interpret(monkeypatch):
  """Whole-control-step kernel parity on the REAL rodent model (the
  mini-model tests cover the code paths; this covers the full-scale
  static tables: 67-body FK levels, 370-row constraint packing,
  8-iteration CG on a contact-rich state). Calibrated tolerance: qacc
  and its downstream products carry ~5e-3 relative spread from benign
  f32 reassociation amplified by the truncated CG + exact line search
  (measured: paired-vs-split factorization — bit-identical math,
  different op shapes — differs by 4.3e-3 on qacc; kernel-vs-XLA-core
  by 6.2e-3). Anything ~10x beyond that is a real semantic break."""
  import mujoco
  # NOTE: importing tests.conftest re-runs its BRR_NO_FUSED setdefault
  # (namespace-package double import under pytest), so it must precede
  # the delenv — not follow it.
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import fused_full as ff
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)

  mj = mujoco.MjModel.from_xml_path(model_path("rodent_optimized.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = 8
  mj.opt.ls_iterations = 8
  m = from_mj_model(mj)
  assert ff.eligible_steps(m)
  B = 8
  key = jax.random.PRNGKey(0)
  k1, k2, k3 = jax.random.split(key, 3)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(k1, (B, m.nq), jnp.float32, -0.02, 0.02)
  qvel = jax.random.uniform(k2, (B, m.nv), jnp.float32, -0.3, 0.3)
  act = jnp.zeros((B, m.na), jnp.float32)
  ctrl = jax.random.uniform(k3, (B, m.nu), jnp.float32, -0.5, 0.5)
  qfa = jnp.zeros((B, m.nv), jnp.float32)
  args = (qpos, qvel, act, ctrl, qfa)
  n_frames = 2

  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
  assert len(out) == len(ref)
  for i, (a, b) in enumerate(zip(out, ref)):
    a = np.clip(np.asarray(a, np.float64), -1e10, 1e3)
    b = np.clip(np.asarray(b, np.float64), -1e10, 1e3)
    err = np.max(np.abs(a - b) / (1.0 + np.abs(b)))
    assert err < 5e-2, f"output {i}: rel err {err}"


@pytest.mark.slow
def test_fused_steps_kernel_pair_interpret(monkeypatch):
  """Same full-scale kernel parity for rodent_pair.xml (nv=146, np_=152,
  TWO free-joint trees — BASELINE config 5's single-chip leg). The
  pair-model v3 eligibility was previously proven only on a mini
  two-free-tree model; this runs the real static tables through the
  interpret-mode kernel so the Mosaic compile is the only remaining
  unknown."""
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import fused_full as ff
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)

  mj = mujoco.MjModel.from_xml_path(model_path("rodent_pair.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = 8
  mj.opt.ls_iterations = 8
  m = from_mj_model(mj)
  assert ff.eligible_steps(m)
  assert len(ff.statics2(m).free_js) == 2
  B = 4
  key = jax.random.PRNGKey(1)
  k1, k2, k3 = jax.random.split(key, 3)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(k1, (B, m.nq), jnp.float32, -0.02, 0.02)
  qvel = jax.random.uniform(k2, (B, m.nv), jnp.float32, -0.3, 0.3)
  act = jnp.zeros((B, m.na), jnp.float32)
  ctrl = jax.random.uniform(k3, (B, m.nu), jnp.float32, -0.5, 0.5)
  qfa = jnp.zeros((B, m.nv), jnp.float32)
  args = (qpos, qvel, act, ctrl, qfa)
  n_frames = 2

  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
  assert len(out) == len(ref)
  for i, (a, b) in enumerate(zip(out, ref)):
    a = np.clip(np.asarray(a, np.float64), -1e10, 1e3)
    b = np.clip(np.asarray(b, np.float64), -1e10, 1e3)
    err = np.max(np.abs(a - b) / (1.0 + np.abs(b)))
    assert err < 5e-2, f"output {i}: rel err {err}"


def test_fused_steps_kernel_ls_par(monkeypatch):
  """The production-default PARALLEL line search (one batched phi'
  evaluation at _LS_SCALES candidates + bracketed secant + Newton
  polish, replacing the n_ls sequential Newton refinements; BRR_LS_SEQ=1
  reverts and is pinned suite-wide by conftest) must stay within the
  calibrated truncated-CG envelope of the SEQUENTIAL stage-path
  reference.  Unlike
  BRR_CHOL_SPLIT this changes step sizes within line-search tolerance, so
  the bound is the 5e-2 envelope used by the full-scale parity tests, not
  bitwise rtol (measured on this model: 7.3e-3 worst — same band as the
  6.2e-3 kernel-vs-core f32 reassociation noise)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  monkeypatch.delenv("BRR_LS_SEQ", raising=False)  # production default
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 2

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)

  def _clear():
    ff._kernel.cache_clear()
    ff._kernel_steps.cache_clear()

  _clear()
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
    monkeypatch.undo()
    _clear()
  assert len(out) == len(ref)
  for i, (a, b) in enumerate(zip(out, ref)):
    a = np.clip(np.asarray(a, np.float64), -1e10, 1e3)
    b = np.clip(np.asarray(b, np.float64), -1e10, 1e3)
    err = np.max(np.abs(a - b) / (1.0 + np.abs(b)))
    assert err < 5e-2, f"output {i}: rel err {err}"


def _rodent_lspar_setup(qpos_jitter, qvel_range, ctrl_range):
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.ops import fused_full as ff

  mj = mujoco.MjModel.from_xml_path(model_path("rodent_optimized.xml"))
  mj.opt.jacobian = 0
  mj.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj.opt.iterations = 8
  mj.opt.ls_iterations = 8
  m = from_mj_model(mj)
  assert ff.eligible_steps(m)
  B = 8
  key = jax.random.PRNGKey(0)
  k1, k2, k3 = jax.random.split(key, 3)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (B, 1)) + \
      jax.random.uniform(k1, (B, m.nq), jnp.float32, -qpos_jitter,
                         qpos_jitter)
  qvel = jax.random.uniform(k2, (B, m.nv), jnp.float32, -qvel_range,
                            qvel_range)
  act = jnp.zeros((B, m.na), jnp.float32)
  ctrl = jax.random.uniform(k3, (B, m.nu), jnp.float32, -ctrl_range,
                            ctrl_range)
  qfa = jnp.zeros((B, m.nv), jnp.float32)
  return m, (qpos, qvel, act, ctrl, qfa)


def _rodent_lspar_run(monkeypatch, m, args, n_frames, ref_dtype=None,
                      outputs=None):
  from brax_rodent_run_tpu.ops import fused_full as ff
  ref_args = args if ref_dtype is None else tuple(
      a.astype(ref_dtype) for a in args)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*ref_args)

  def _clear():
    ff._kernel.cache_clear()
    ff._kernel_steps.cache_clear()

  monkeypatch.delenv("BRR_LS_SEQ", raising=False)  # production default
  _clear()
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
    monkeypatch.undo()
    _clear()
  assert len(out) == len(ref)
  worst = 0.0
  for i, (a, b) in enumerate(zip(out, ref)):
    if outputs is not None and i not in outputs:
      continue
    a = np.clip(np.asarray(a, np.float64), -1e10, 1e3)
    b = np.clip(np.asarray(b, np.float64), -1e10, 1e3)
    worst = max(worst, float(np.max(np.abs(a - b) / (1.0 + np.abs(b)))))
  return worst


@pytest.mark.slow
def test_fused_steps_kernel_rodent_ls_par(monkeypatch):
  """Full-scale parallel-line-search (production default) parity on the
  REAL rodent model vs the sequential-line-search stage reference, in
  the TRAINING-REGIME state distribution (reset-scale jitter, the
  regime the bench and PPO actually step): the default must hold the
  5e-2 envelope of the pinned-sequential kernel. Measured (r4 diag):
  parallel == sequential to 1.3e-4 here."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  m, args = _rodent_lspar_setup(0.005, 0.1, 0.3)
  worst = _rodent_lspar_run(monkeypatch, m, args, n_frames=2)
  assert worst < 5e-2, worst


@pytest.mark.slow
def test_fused_steps_kernel_rodent_ls_par_stress(monkeypatch):
  """Bounded deviation on VIOLENT stress states (deep penetrations,
  |qacc| ~ 2e5 — 20x the training regime): here BOTH truncated line
  searches (MuJoCo's 1+7 sequential Newton and the batched bracket +
  safeguarded polish) are non-converged by design, so iterates may
  legitimately differ. Gate on the SOLVER output (qacc, index 16) vs an
  f64 sequential reference: measured (r4 diag) parallel-f32 worst lane
  1.0e-1 there (sequential-f32: 6e-4 — the accuracy cost of the
  parallel default on such states, traded for +21% on-chip throughput;
  BRR_LS_SEQ=1 reverts). Training-regime states show NO such gap (see
  the non-stress test). Downstream outputs (qvel_new etc.) inherit the
  same single-lane deviation amplified by the (1+|ref|) normalization
  and are not separately informative."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  m, args = _rodent_lspar_setup(0.02, 0.3, 0.5)
  worst = _rodent_lspar_run(monkeypatch, m, args, n_frames=1,
                            ref_dtype=jnp.float64, outputs={16})
  assert worst < 2e-1, worst


class _VmemShim:
  """Minimal VMEM-ref stand-in so the in-place factor routines run as
  plain jnp code in tests."""

  def __init__(self, x):
    self.x = jnp.asarray(x)

  def __getitem__(self, i):
    return self.x[i]

  def __setitem__(self, i, v):
    self.x = self.x.at[i].set(v)

  @property
  def shape(self):
    return self.x.shape

  @property
  def dtype(self):
    return self.x.dtype


def test_tree_chol_reverse_matches_dense_rodent():
  """r5 lever: reverse-order (U U^T) tree-run-restricted blocked
  factorization on the REAL rodent mass matrix — (1) U is exactly zero
  outside the upper ancestor pattern (fill-free, unlike parents-first
  lower Cholesky: test_tree_sparse_cholesky_matches_dense_rodent pins
  that fill), (2) M^-1 matches the dense-blocked inverse to f32
  reassociation noise."""
  import mujoco
  from tests.conftest import model_path
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.physics import smooth
  from brax_rodent_run_tpu.physics.types import make_data

  m = from_mj_model(mujoco.MjModel.from_xml_path(
      model_path("rodent_new.xml")))
  d = make_data(m, dtype=jnp.float32)
  key = jax.random.PRNGKey(3)
  qpos = jnp.asarray(m.qpos0, jnp.float32) + jax.random.uniform(
      key, (m.nq,), jnp.float32, -0.1, 0.1)
  d = smooth.crb(m, smooth.com_pos(m, smooth.kinematics(
      m, d.replace(qpos=qpos))), factor=False)
  qM = np.asarray(d.qM, np.float64)
  nv = m.nv
  np_ = ((nv + 7) // 8) * 8
  A = np.zeros((np_, np_))
  A[:nv, :nv] = qM
  A[range(nv, np_), range(nv, np_)] = 1.0
  E = 8
  jit_b = 1.0 + 0.05 * np.arange(E)
  Ab = (A[:, :, None] * jit_b).astype(np.float32)

  meta = chol_mod.chol_tree_meta(
      tuple(int(x) for x in m.dof_parentid), nv, np_)
  assert meta is not None
  fac, inv = chol_mod.chol_routines(meta)

  a, u = _VmemShim(Ab.copy()), _VmemShim(np.zeros_like(Ab))
  x, iv = _VmemShim(np.zeros_like(Ab)), _VmemShim(np.zeros_like(Ab))
  fac(np_, np_, a, u)
  U = np.asarray(u.x, np.float64)
  for e in range(E):
    err = np.max(np.abs(U[:, :, e] @ U[:, :, e].T - A * jit_b[e]))
    assert err < 1e-3, (e, err)
  anc = np.zeros((np_, np_), bool)
  pid = m.dof_parentid
  for i in range(nv):
    j = i
    while j >= 0:
      anc[i, j] = anc[j, i] = True
      j = pid[j]
  anc[range(np_), range(np_)] = True
  upper_tree = anc & (np.tri(np_, k=-1, dtype=bool).T | np.eye(np_, dtype=bool))
  assert np.max(np.abs(U[:, :, 0])[~upper_tree]) == 0.0

  inv(np_, u, x, iv)
  IV = np.asarray(iv.x, np.float64)
  for e in range(E):
    err = np.max(np.abs(IV[:nv, :nv, e] @ (qM * jit_b[e]) - np.eye(nv)))
    assert err < 5e-2, (e, err)

  # accuracy parity vs dense: two different f32 elimination orders
  # disagree elementwise by cond(M)*eps (~1e-2 relative on the rodent
  # qM), so compare each against the f64 oracle instead — the tree
  # order must be no less accurate than the dense order
  fd, idn = chol_mod.chol_routines(None)
  a2, l2 = _VmemShim(Ab.copy()), _VmemShim(np.zeros_like(Ab))
  x2, iv2 = _VmemShim(np.zeros_like(Ab)), _VmemShim(np.zeros_like(Ab))
  fd(np_, np_, a2, l2)
  idn(np_, l2, x2, iv2)
  IV2 = np.asarray(iv2.x, np.float64)
  oracle = np.linalg.inv(A * jit_b[0])
  err_tree = np.max(np.abs(IV[:, :, 0] - oracle))
  err_dense = np.max(np.abs(IV2[:, :, 0] - oracle))
  assert err_tree < max(2.0 * err_dense, 1e-3), (err_tree, err_dense)


def test_fused_steps_kernel_tree_chol(monkeypatch):
  """BRR_CHOL_TREE=1 (r5 reverse tree-run factorization) is semantics-
  preserving through the whole-control-step kernel (interpret)."""
  monkeypatch.delenv("BRR_NO_FUSED", raising=False)
  monkeypatch.setenv("BRR_CHOL_TREE", "1")
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = _fused3_model()
  assert ff.eligible_steps(m)
  batch = _fused2_batch(m)
  n_frames = 3

  args = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
          batch.qfrc_applied)
  ref = jax.vmap(lambda *a: ff._core_steps(m, n_frames, *a))(*args)
  ff._kernel.cache_clear()
  ff._kernel_steps.cache_clear()
  ff.FORCE_INTERPRET = True
  try:
    out = ff.fused_steps_batched(m, n_frames, *args)
  finally:
    ff.FORCE_INTERPRET = False
    monkeypatch.undo()
    ff._kernel.cache_clear()
    ff._kernel_steps.cache_clear()
  names = _FF_NAMES + ("qpos_pre", "con_dist", "con_pos", "con_frame")
  for name, a, b in zip(names, out, ref):
    a, b = np.asarray(a), np.asarray(b)
    if name == "con_dist":
      a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3, err_msg=name)
