"""Humanoid forward-run task (BASELINE config 4: cross-body generality).

The reference repo ships models/humanoid.xml for exactly this check (see
SURVEY.md §2.2). Task semantics follow the standard brax/mjx humanoid run:
forward-velocity reward + healthy bonus − ctrl cost, obs without root xy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.envs.base import Env, State
from brax_rodent_run_tpu.physics.types import Data, Model


class Humanoid(Env):

  def __init__(
      self,
      model: Model,
      forward_reward_weight: float = 1.25,
      ctrl_cost_weight: float = 0.1,
      healthy_reward: float = 5.0,
      terminate_when_unhealthy: bool = True,
      healthy_z_range=(1.0, 2.0),
      reset_noise_scale: float = 1e-2,
      exclude_current_positions_from_observation: bool = True,
      n_frames: int = 5,
      dtype=None,
      lean_pipeline: bool = False,
  ):
    super().__init__(model, n_frames=n_frames, dtype=dtype,
                     lean_pipeline=lean_pipeline)
    self._forward_reward_weight = forward_reward_weight
    self._ctrl_cost_weight = ctrl_cost_weight
    self._healthy_reward = healthy_reward
    self._terminate_when_unhealthy = terminate_when_unhealthy
    self._healthy_z_range = healthy_z_range
    self._reset_noise_scale = reset_noise_scale
    self._exclude_xy = exclude_current_positions_from_observation

  @property
  def autoreset_carry_fields(self) -> tuple:
    # reward reads com_before = data0.subtree_com[1] (pre-step state)
    return ("subtree_com",)

  @property
  def observation_size(self) -> int:
    m = self._model
    nq = m.nq - 2 if self._exclude_xy else m.nq
    return nq + m.nv + (m.nbody - 1) * 10 + (m.nbody - 1) * 6 + m.nv

  def reset(self, rng: jax.Array) -> State:
    rng, rng1, rng2 = jax.random.split(rng, 3)
    m = self._model
    low, hi = -self._reset_noise_scale, self._reset_noise_scale
    qpos = jnp.asarray(m.qpos0, self._dtype) + jax.random.uniform(
        rng1, (m.nq,), self._dtype, low, hi)
    qvel = jax.random.uniform(rng2, (m.nv,), self._dtype, low, hi)
    data = self.pipeline_init(qpos, qvel)
    obs = self._get_obs(data, jnp.zeros(m.nu, self._dtype))
    reward, done, zero = jnp.zeros(3, self._dtype)
    metrics = {
        "forward_reward": zero, "reward_linvel": zero,
        "reward_quadctrl": zero, "reward_alive": zero,
        "x_position": zero, "y_position": zero,
        "distance_from_origin": zero, "x_velocity": zero,
        "y_velocity": zero,
    }
    return State(data, obs, reward, done, metrics, {})

  def step(self, state: State, action: jax.Array) -> State:
    action = jnp.asarray(action, self._dtype)
    data0 = state.pipeline_state
    data = self.pipeline_step(data0, action)

    com_before = data0.subtree_com[1]
    com_after = data.subtree_com[1]
    velocity = (com_after - com_before) / self.dt
    forward_reward = self._forward_reward_weight * velocity[0]

    min_z, max_z = self._healthy_z_range
    is_healthy = jnp.where(data.qpos[2] < min_z, 0.0, 1.0)
    is_healthy = jnp.where(data.qpos[2] > max_z, 0.0,
                           is_healthy).astype(self._dtype)
    if self._terminate_when_unhealthy:
      healthy_reward = jnp.asarray(self._healthy_reward, self._dtype)
    else:
      healthy_reward = self._healthy_reward * is_healthy

    ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

    obs = self._get_obs(data, action)
    reward = forward_reward + healthy_reward - ctrl_cost
    done = 1.0 - is_healthy if self._terminate_when_unhealthy else \
        jnp.zeros((), self._dtype)
    metrics = dict(state.metrics)
    metrics.update(
        forward_reward=forward_reward,
        reward_linvel=forward_reward,
        reward_quadctrl=-ctrl_cost,
        reward_alive=healthy_reward,
        x_position=com_after[0],
        y_position=com_after[1],
        distance_from_origin=jnp.linalg.norm(com_after),
        x_velocity=velocity[0],
        y_velocity=velocity[1],
    )
    return state.replace(pipeline_state=data, obs=obs, reward=reward,
                         done=done, metrics=metrics)

  def _get_obs(self, data: Data, action: jax.Array) -> jax.Array:
    qpos = data.qpos[2:] if self._exclude_xy else data.qpos
    return jnp.concatenate([
        qpos,
        data.qvel,
        data.cinert[1:].ravel(),
        data.cvel[1:].ravel(),
        data.qfrc_actuator,
    ])
