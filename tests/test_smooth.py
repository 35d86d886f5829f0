"""Stage-parity tests: our smooth dynamics vs the MuJoCo C oracle.

Each stage of the pipeline (kinematics -> comPos -> CRB -> comVel -> RNE ->
tendon/transmission -> passive -> actuation -> smooth acceleration) is
compared field-by-field against mujoco's mj_* functions on randomized states
of the reference models (BASELINE config 1 contract).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import smooth
from brax_rodent_run_tpu.physics.types import make_data

MODELS = ["humanoid.xml", "rodent_new.xml", "rodent_cpu.xml"]


def _random_state(mj_model, seed=0, vel_scale=1.0):
  rng = np.random.RandomState(seed)
  mjd = mujoco.MjData(mj_model)
  qpos = mj_model.qpos0.copy()
  # perturb joints; keep quaternions normalized
  qpos += rng.uniform(-0.1, 0.1, mj_model.nq)
  for j in range(mj_model.njnt):
    if mj_model.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      adr = mj_model.jnt_qposadr[j]
      q = qpos[adr + 3:adr + 7]
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = rng.uniform(-vel_scale, vel_scale, mj_model.nv)
  if mj_model.na:
    mjd.act[:] = rng.uniform(-0.3, 0.3, mj_model.na)
  mjd.ctrl[:] = rng.uniform(-1, 1, mj_model.nu)
  return mjd


def _our_data(m, mjd):
  d = make_data(m, dtype=jnp.float64)
  return d.replace(
      qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel),
      act=jnp.array(mjd.act), ctrl=jnp.array(mjd.ctrl))


@pytest.fixture(scope="module", params=MODELS)
def pair(request):
  mj_model = mujoco.MjModel.from_xml_path(model_path(request.param))
  m = from_mj_model(mj_model)
  return mj_model, m


def test_kinematics(pair):
  mj_model, m = pair
  for seed in range(3):
    mjd = _random_state(mj_model, seed)
    mujoco.mj_kinematics(mj_model, mjd)
    d = smooth.kinematics(m, _our_data(m, mjd))
    np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-10)
    # quaternion sign is a gauge freedom: compare |dot| = 1
    dots = np.abs(np.sum(np.asarray(d.xquat) * mjd.xquat, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-10)
    np.testing.assert_allclose(d.xmat, mjd.xmat.reshape(-1, 3, 3), atol=1e-10)
    np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-10)
    np.testing.assert_allclose(d.ximat, mjd.ximat.reshape(-1, 3, 3),
                               atol=1e-10)
    np.testing.assert_allclose(d.xanchor, mjd.xanchor, atol=1e-10)
    np.testing.assert_allclose(d.xaxis, mjd.xaxis, atol=1e-10)
    np.testing.assert_allclose(d.geom_xpos, mjd.geom_xpos, atol=1e-10)
    np.testing.assert_allclose(d.geom_xmat, mjd.geom_xmat.reshape(-1, 3, 3),
                               atol=1e-10)
    if m.nsite:
      np.testing.assert_allclose(d.site_xpos, mjd.site_xpos, atol=1e-10)


def test_com_pos(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 1)
  mujoco.mj_kinematics(mj_model, mjd)
  mujoco.mj_comPos(mj_model, mjd)
  d = smooth.com_pos(m, smooth.kinematics(m, _our_data(m, mjd)))
  np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-10)
  np.testing.assert_allclose(d.cinert, mjd.cinert, atol=1e-9)
  np.testing.assert_allclose(d.cdof, mjd.cdof, atol=1e-10)


def test_crb(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 2)
  mujoco.mj_kinematics(mj_model, mjd)
  mujoco.mj_comPos(mj_model, mjd)
  mujoco.mj_crb(mj_model, mjd)
  d = smooth.crb(m, smooth.com_pos(m, smooth.kinematics(m, _our_data(m, mjd))),
                 factor=False)
  qM_mj = np.zeros((m.nv, m.nv))
  mujoco.mj_fullM(mj_model, mjd, qM_mj)
  np.testing.assert_allclose(d.qM, qM_mj, atol=1e-9)
  # factorization round-trip: M^{-1} M = I
  d = smooth.factor_m(m, d)
  sol = smooth.solve_m(m, d, jnp.asarray(qM_mj))
  np.testing.assert_allclose(sol, np.eye(m.nv), atol=1e-7)


def test_com_vel(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 3)
  mujoco.mj_forward(mj_model, mjd)  # fills cvel, cdof_dot
  d = smooth.com_vel(
      m, smooth.crb(m, smooth.com_pos(m, smooth.kinematics(
          m, _our_data(m, mjd)))))
  np.testing.assert_allclose(d.cvel, mjd.cvel, atol=1e-9)
  np.testing.assert_allclose(d.cdof_dot, mjd.cdof_dot, atol=1e-9)


def test_rne(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 4)
  mujoco.mj_forward(mj_model, mjd)
  d = _forward_smooth(m, mjd)
  np.testing.assert_allclose(d.qfrc_bias, mjd.qfrc_bias, atol=1e-8)


def _forward_smooth(m, mjd):
  d = _our_data(m, mjd)
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  d = smooth.transmission(m, d)
  d = smooth.com_vel(m, d)
  d = smooth.rne(m, d)
  d = smooth.passive(m, d)
  d = smooth.fwd_actuation(m, d)
  d = smooth.fwd_acceleration(m, d)
  return d


def test_passive(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 5)
  mujoco.mj_forward(mj_model, mjd)
  d = _forward_smooth(m, mjd)
  np.testing.assert_allclose(d.qfrc_passive, mjd.qfrc_passive, atol=1e-9)


def test_tendon_transmission(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 6)
  mujoco.mj_forward(mj_model, mjd)
  d = _forward_smooth(m, mjd)
  if m.ntendon:
    np.testing.assert_allclose(d.ten_length, mjd.ten_length, atol=1e-10)
    np.testing.assert_allclose(d.ten_velocity, mjd.ten_velocity, atol=1e-10)
  np.testing.assert_allclose(d.actuator_length, mjd.actuator_length,
                             atol=1e-10)
  np.testing.assert_allclose(d.actuator_velocity, mjd.actuator_velocity,
                             atol=1e-9)
  moment = np.zeros((m.nu, m.nv))
  mujoco.mju_sparse2dense(moment, mjd.actuator_moment.reshape(-1),
                          mjd.moment_rownnz, mjd.moment_rowadr,
                          mjd.moment_colind.reshape(-1))
  np.testing.assert_allclose(d.actuator_moment, moment, atol=1e-10)


def test_actuation(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 7)
  mujoco.mj_forward(mj_model, mjd)
  d = _forward_smooth(m, mjd)
  np.testing.assert_allclose(d.actuator_force, mjd.actuator_force, atol=1e-9)
  np.testing.assert_allclose(d.qfrc_actuator, mjd.qfrc_actuator, atol=1e-9)
  np.testing.assert_allclose(d.act_dot, mjd.act_dot, atol=1e-9)


def test_smooth_acceleration(pair):
  mj_model, m = pair
  mjd = _random_state(mj_model, 8)
  mujoco.mj_forward(mj_model, mjd)
  d = _forward_smooth(m, mjd)
  np.testing.assert_allclose(d.qfrc_smooth, mjd.qfrc_smooth, atol=1e-8)
  np.testing.assert_allclose(d.qacc_smooth, mjd.qacc_smooth, atol=1e-6)
