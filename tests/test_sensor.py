"""Sensor parity vs the MuJoCo C oracle.

The rodent models declare 8 sensors (accelerometer/velocimeter/gyro on the
head site, 4 touch boxes, subtreelinvel on the torso —
rodent_optimized.xml:573-582). The reference's MJX pipeline computes
sensordata every step; we must match it.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import forward
from brax_rodent_run_tpu.physics.types import make_data


_MINI_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" contype="1" conaffinity="1"/>
    <body name="box" pos="0 0 0.06">
      <freejoint/>
      <geom name="bgeom" type="box" size="0.05 0.05 0.05" density="800"
            contype="1" conaffinity="1"/>
      <site name="imu" pos="0.01 0 0.02"/>
      <site name="pad" type="box" size="0.06 0.06 0.055" pos="0 0 0"/>
      <body name="arm" pos="0 0 0.05">
        <joint name="swing" type="hinge" axis="0 1 0" damping="0.01"/>
        <geom name="ageom" type="capsule" size="0.01" fromto="0 0 0 0 0 0.1"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="swing" gear="0.2"/></actuator>
  <sensor>
    <accelerometer site="imu"/>
    <velocimeter site="imu"/>
    <gyro site="imu"/>
    <touch site="pad"/>
    <subtreelinvel body="box"/>
  </sensor>
</mujoco>
"""


def test_mini_sensors_match_oracle():
  """All 5 sensor types on a small falling/contacting model (fast)."""
  mj_model = mujoco.MjModel.from_xml_string(_MINI_XML)
  _converged_opts(mj_model)
  m = from_mj_model(mj_model)
  assert m.nsensor == 5

  mjd = mujoco.MjData(mj_model)
  rng = np.random.RandomState(0)
  mjd.qvel[:] = rng.uniform(-0.1, 0.1, mj_model.nv)

  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel))
  step = jax.jit(lambda d, u: forward.step(m, d, u))

  ctrls = rng.uniform(-1, 1, (50, mj_model.nu))
  touched = False
  for t in range(50):
    mjd.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj_model, mjd)
    d = step(d, ctrls[t])
    ours = np.asarray(d.sensordata)
    ref = np.asarray(mjd.sensordata)
    err = np.max(np.abs(ours - ref) / (1.0 + np.abs(ref)))
    assert err < 1e-5 * (1 + 30 * t), (t, ours, ref)
    if ref[mj_model.sensor_adr[3]] > 1e-6:
      touched = True
  assert touched


def _converged_opts(mj_model):
  mj_model.opt.jacobian = 0
  mj_model.opt.solver = mujoco.mjtSolver.mjSOL_NEWTON
  mj_model.opt.iterations = 150
  mj_model.opt.ls_iterations = 60
  mj_model.opt.tolerance = 1e-12
  mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART


def test_sensor_disable_flag():
  mj_model = mujoco.MjModel.from_xml_string(_MINI_XML)
  _converged_opts(mj_model)
  mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_SENSOR
  m = from_mj_model(mj_model)
  d = make_data(m, dtype=jnp.float64)
  d = jax.jit(lambda d: forward.step(m, d))(d)
  assert np.allclose(np.asarray(d.sensordata), 0.0)
