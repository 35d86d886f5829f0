"""Mocap preprocessing parity: features vs dm_control-rescaled MuJoCo C
kinematics; velocity FD vs analytic; H5/pickle round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.preprocessing import (
    ReferenceClip, compute_velocity_from_kinematics, process_clip,
    load_reference_clip_from_h5, save_reference_clip_to_h5)
from brax_rodent_run_tpu.preprocessing.rescale import rescale_model


def _synth_traj(nq, T=20, seed=0):
  rng = np.random.RandomState(seed)
  base = rng.uniform(-0.05, 0.05, (1, nq))
  walk = np.cumsum(rng.uniform(-0.01, 0.01, (T, nq)), axis=0)
  traj = base + walk
  # normalize root quats
  q = traj[:, 3:7]
  traj[:, 3:7] = q / np.linalg.norm(q, axis=1, keepdims=True)
  traj[:, 2] += 0.1
  return traj


def test_features_match_rescaled_mujoco():
  """Our rescale(0.9)+FK == dm_control rescale + MuJoCo C kinematics."""
  import mujoco
  from dm_control import mjcf as mjcf_dm
  from dm_control.locomotion.walkers import rescale

  path = model_path("rodent_new.xml")
  root = mjcf_dm.from_path(path)
  rescale.rescale_subtree(root, 0.9, 0.9)
  physics = mjcf_dm.Physics.from_mjcf_model(root)
  mj_model = physics.model.ptr

  traj = _synth_traj(mj_model.nq, T=10)
  mjd = mujoco.MjData(mj_model)
  xpos_ref, xquat_ref = [], []
  for t in range(traj.shape[0]):
    mjd.qpos[:] = traj[t]
    mjd.qvel[:] = 0
    mujoco.mj_kinematics(mj_model, mjd)
    xpos_ref.append(mjd.xpos.copy())
    xquat_ref.append(mjd.xquat.copy())

  ours = from_mj_model(mujoco.MjModel.from_xml_path(path))
  ours = rescale_model(ours, 0.9, xml_path=path)
  clip = process_clip(jnp.array(traj), ours, dt=0.02)

  np.testing.assert_allclose(clip.body_positions, np.stack(xpos_ref),
                             atol=5e-6)
  dots = np.abs(np.sum(np.asarray(clip.body_quaternions)
                       * np.stack(xquat_ref), axis=-1))
  np.testing.assert_allclose(dots, 1.0, atol=1e-9)
  np.testing.assert_allclose(clip.position, traj[:, :3], atol=1e-12)
  np.testing.assert_allclose(clip.joints, traj[:, 7:], atol=1e-12)


def test_velocity_fd():
  T, nq = 12, 10  # free joint (7) + 3 hinges
  rng = np.random.RandomState(1)
  traj = rng.uniform(-1, 1, (T, nq))
  traj[:, 3:7] /= np.linalg.norm(traj[:, 3:7], axis=1, keepdims=True)
  dt = 0.02
  vel = np.asarray(compute_velocity_from_kinematics(jnp.array(traj), dt))
  assert vel.shape == (T - 1, nq - 1)
  np.testing.assert_allclose(vel[:, :3], np.diff(traj[:, :3], axis=0) / dt,
                             atol=1e-9)
  np.testing.assert_allclose(vel[:, 6:], np.diff(traj[:, 7:], axis=0) / dt,
                             atol=1e-9)
  # angular velocity magnitude == rotation angle / dt
  import brax_rodent_run_tpu.physics.math as pm
  for t in range(T - 1):
    dq = pm.quat_mul(pm.quat_conj(jnp.array(traj[t, 3:7])),
                     jnp.array(traj[t + 1, 3:7]))
    ang = 2 * np.arccos(min(abs(float(dq[0])), 1.0))
    np.testing.assert_allclose(np.linalg.norm(vel[t, 3:6]), ang / dt,
                               rtol=1e-6)


def test_h5_roundtrip(tmp_path):
  rng = np.random.RandomState(0)
  clip = ReferenceClip(
      position=jnp.array(rng.randn(5, 3)),
      quaternion=jnp.array(rng.randn(5, 4)),
      joints=jnp.array(rng.randn(5, 7)),
      body_positions=jnp.array(rng.randn(5, 4, 3)),
      velocity=jnp.array(rng.randn(5, 3)),
      joints_velocity=jnp.array(rng.randn(5, 7)),
      angular_velocity=jnp.array(rng.randn(5, 3)),
      body_quaternions=jnp.array(rng.randn(5, 4, 4)),
  )
  f = str(tmp_path / "clip.h5")
  save_reference_clip_to_h5(f, "clip84", clip)
  back = load_reference_clip_from_h5(f, "clip84")
  np.testing.assert_allclose(back.position, clip.position)
  np.testing.assert_allclose(back.body_quaternions, clip.body_quaternions)


def test_pickle_cache_roundtrip(tmp_path):
  from brax_rodent_run_tpu.preprocessing.clips import (
      load_clip_pickle, save_clip_pickle)
  clip = ReferenceClip(position=jnp.ones((3, 3)))
  p = str(tmp_path / "84.p")
  save_clip_pickle(p, clip)
  np.testing.assert_allclose(load_clip_pickle(p).position, 1.0)
