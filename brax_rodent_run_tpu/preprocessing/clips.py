"""Mocap clip preprocessing: stac qpos trajectories -> ReferenceClip.

Rebuilds the reference pipeline (preprocessing/mjx_preprocess.py) pure-JAX
on our physics engine:

  stac pickle -> rescale model x0.9 -> forward-kinematics scan over frames
  -> finite-difference velocities with quaternion log-map -> ReferenceClip

Differences by design (SURVEY.md §7 step 4): the per-frame Python loop for
angular velocities (mjx_preprocess.py:213-218) is a single vmap; rescaling
happens on our compiled Model instead of the dm_control DOM.
"""

from __future__ import annotations

import pickle
from collections import defaultdict
from typing import List, Union

import jax
import jax.numpy as jnp
from flax import struct

from brax_rodent_run_tpu.physics import math as pm
from brax_rodent_run_tpu.physics import smooth
from brax_rodent_run_tpu.physics.types import Model, make_data
from brax_rodent_run_tpu.preprocessing.rescale import rescale_model


@struct.dataclass
class ReferenceClip:
  """Tracking targets stored in the env (field layout mirrors the
  reference's ReferenceClip, mjx_preprocess.py:23-41, so cached clips are
  interchangeable)."""

  # qpos split
  position: jnp.ndarray = None
  quaternion: jnp.ndarray = None
  joints: jnp.ndarray = None
  # xpos
  body_positions: jnp.ndarray = None
  # velocities (finite-difference)
  velocity: jnp.ndarray = None
  joints_velocity: jnp.ndarray = None
  angular_velocity: jnp.ndarray = None
  # xquat
  body_quaternions: jnp.ndarray = None


def extract_features(model: Model, mocap_qpos: jax.Array) -> ReferenceClip:
  """Forward kinematics over all frames (lax.scan), collect features."""
  d0 = make_data(model, dtype=mocap_qpos.dtype)

  def f(d, qpos):
    d = d.replace(qpos=qpos, qvel=jnp.zeros_like(d.qvel))
    d = smooth.kinematics(model, d)
    return d, (qpos[:3], qpos[3:7], qpos[7:], d.xpos, d.xquat)

  _, (position, quaternion, joints, xpos, xquat) = jax.lax.scan(
      f, d0, mocap_qpos)
  return ReferenceClip(
      position=position, quaternion=quaternion, joints=joints,
      body_positions=xpos, body_quaternions=xquat)


def compute_velocity_from_kinematics(qpos_traj: jax.Array,
                                     dt: float) -> jax.Array:
  """FD velocities; quaternion pairs -> local angular velocity, vmapped."""
  qvel_trans = (qpos_traj[1:, :3] - qpos_traj[:-1, :3]) / dt

  def ang(q0, q1):
    dq = pm.quat_mul(pm.quat_conj(q0), q1)
    dq = dq / jnp.linalg.norm(dq)
    # axis-angle with angle wrapped to (-pi, pi] (reference
    # transformations.py:117-139 semantics incl. the pole guard)
    angle = 2.0 * jnp.arccos(jnp.clip(dq[0], -1.0, 1.0))
    qn = jnp.sin(angle / 2.0)
    wrapped = (angle + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    axis = dq[1:4] / jnp.where(jnp.abs(qn) < 1e-10, 1.0, qn)
    out = axis * wrapped
    return jnp.where(angle < 1e-10, jnp.zeros(3, qpos_traj.dtype), out)

  qvel_gyro = jax.vmap(ang)(qpos_traj[:-1, 3:7], qpos_traj[1:, 3:7]) / dt
  qvel_joints = (qpos_traj[1:, 7:] - qpos_traj[:-1, 7:]) / dt
  return jnp.concatenate([qvel_trans, qvel_gyro, qvel_joints], axis=1)


def process_clip(mocap_qpos: jax.Array, model: Model,
                 max_qvel: float = 20.0, dt: float = 0.02) -> ReferenceClip:
  """Features + clipped FD velocities for one clip
  (mjx_preprocess.py:93-134 contract, incl. last-frame padding)."""
  clip = extract_features(model, mocap_qpos)
  padded = jnp.concatenate([mocap_qpos, mocap_qpos[-1:, :]], axis=0)
  qvel = compute_velocity_from_kinematics(padded, dt)
  qvel = qvel.at[:, 6:].set(jnp.clip(qvel[:, 6:], -max_qvel, max_qvel))
  return clip.replace(
      velocity=qvel[:, :3],
      angular_velocity=qvel[:, 3:6],
      joints_velocity=qvel[:, 6:],
  )


def process_clip_to_train(
    stac_path: str,
    mjcf_path: str = "./assets/rodent.xml",
    scale_factor: float = 0.9,
    start_step: int = 0,
    clip_length: int = 250,
    max_qvel: float = 20.0,
    dt: float = 0.02,
    model: Model | None = None,
) -> ReferenceClip:
  """Load stac qpos, rescale the model, process one clip
  (mjx_preprocess.py:44-90 contract). Pass ``model`` to skip MJCF loading."""
  with open(stac_path, "rb") as f:
    d = pickle.load(f)
  mocap_qpos = jnp.array(d["qpos"])[start_step:start_step + clip_length]

  if model is None:
    from brax_rodent_run_tpu.mjcf import load_model
    model = load_model(mjcf_path)
  model = rescale_model(model, scale_factor, xml_path=mjcf_path)
  return process_clip(mocap_qpos, model, max_qvel=max_qvel, dt=dt)


# ---------------------------------------------------------------------------
# Clip I/O: pickle cache (brax_rodent_run_ppo.py:59-77) + H5 multi-clip
# (mjx_preprocess.py:223-283)
# ---------------------------------------------------------------------------

def save_clip_pickle(path: str, clip: ReferenceClip) -> None:
  with open(path, "wb") as f:
    pickle.dump(clip, f)


def load_clip_pickle(path: str) -> ReferenceClip:
  with open(path, "rb") as f:
    return pickle.load(f)


_FIELDS = ("position", "quaternion", "joints", "body_positions",
           "velocity", "joints_velocity", "angular_velocity",
           "body_quaternions")


def save_reference_clip_to_h5(filename: str,
                              clip_names: Union[List[str], str],
                              clip: ReferenceClip) -> None:
  import h5py
  assert isinstance(clip_names, (str, list))
  with h5py.File(filename, "w") as hf:
    if isinstance(clip_names, str):
      for attr in _FIELDS:
        value = getattr(clip, attr)
        if value is not None:
          hf.create_dataset(f"{clip_names}/{attr}", data=value)
    else:
      for i, name in enumerate(clip_names):
        for attr in _FIELDS:
          value = getattr(clip, attr)
          if value is not None:
            hf.create_dataset(f"{name}/{attr}", data=value[i])


def load_reference_clip_from_h5(
    filename: str, clip_names: Union[List[str], str]) -> ReferenceClip:
  import h5py
  assert isinstance(clip_names, (str, list))
  if isinstance(clip_names, str):
    clip_names = [clip_names]
  aggregated = defaultdict(list)
  with h5py.File(filename, "r") as hf:
    for name in clip_names:
      for attr in _FIELDS:
        if f"{name}/{attr}" in hf:
          aggregated[attr].append(hf[f"{name}/{attr}"][:])
  stacked = {k: jnp.stack([jnp.asarray(x) for x in v])
             for k, v in aggregated.items()}
  if len(clip_names) == 1:
    stacked = {k: v[0] for k, v in stacked.items()}
  return ReferenceClip(**stacked)
