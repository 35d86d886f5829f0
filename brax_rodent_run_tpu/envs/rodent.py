"""Rodent mocap-tracking "run" task.

Behavioral parity with the reference env (Rodent_Env_Brax.py), including its
documented quirks, which are preserved bit-for-bit for trajectory/return
parity (SURVEY.md §3.2 hard-parts list):

- pos_reward reads the PRE-increment frame (state.info, not the updated
  info) while obs use the post-increment frame (+1 lookahead)
  (Rodent_Env_Brax.py:106-113 vs :125,144)
- reset draws start_frame from the unsplit rng and splits an rng_pos that is
  never used (Rodent_Env_Brax.py:73-75)
- reset noise is added AFTER the root xy placement, so the root position is
  also perturbed (Rodent_Env_Brax.py:82-84)
- healthy gating / termination (Rodent_Env_Brax.py:115-121)
- obs = qpos ‖ qvel ‖ cinert[1:] ‖ cvel[1:] ‖ qfrc_actuator ‖ tracking-vec
  (1279 dims for rodent_new; Rodent_Env_Brax.py:149-158)

Set ``fix_quirks=True`` to get the "clean" semantics instead (frame index
consistent between reward and obs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.envs.base import Env, State
from brax_rodent_run_tpu.physics.types import Data, Model


class Rodent(Env):
  """Mocap-tracking rodent (reference defaults: Rodent_Env_Brax.py:21-35)."""

  def __init__(
      self,
      model: Model,
      track_pos: jax.Array,
      forward_reward_weight: float = 10.0,
      ctrl_cost_weight: float = 0.1,
      healthy_reward: float = 1.0,
      terminate_when_unhealthy: bool = True,
      healthy_z_range=(0.03, 0.5),
      reset_noise_scale: float = 1e-2,
      n_frames: int = 10,
      fix_quirks: bool = False,
      dtype=None,
      lean_pipeline: bool = False,
  ):
    super().__init__(model, n_frames=n_frames, dtype=dtype,
                     lean_pipeline=lean_pipeline)
    self._track_pos = jnp.asarray(track_pos, self._dtype)
    self._forward_reward_weight = forward_reward_weight
    self._ctrl_cost_weight = ctrl_cost_weight
    self._healthy_reward = healthy_reward
    self._terminate_when_unhealthy = terminate_when_unhealthy
    self._healthy_z_range = healthy_z_range
    self._reset_noise_scale = reset_noise_scale
    self._fix_quirks = fix_quirks

  @property
  def observation_size(self) -> int:
    m = self._model
    return m.nq + m.nv + (m.nbody - 1) * 10 + (m.nbody - 1) * 6 + m.nv + 3

  def reset(self, rng: jax.Array) -> State:
    rng, rng1, rng2, rng_pos = jax.random.split(rng, 4)
    del rng_pos  # split but unused, as in the reference (:73)

    start_frame = jax.random.randint(rng, (), 0, 100)
    info = {"cur_frame": start_frame}

    low, hi = -self._reset_noise_scale, self._reset_noise_scale
    m = self._model
    qpos = jnp.asarray(m.qpos0, self._dtype).at[:3].set(
        self._track_pos[start_frame]
    ) + jax.random.uniform(rng1, (m.nq,), self._dtype, low, hi)
    qvel = jax.random.uniform(rng2, (m.nv,), self._dtype, low, hi)

    data = self.pipeline_init(qpos, qvel)
    obs = self._get_obs(data, jnp.zeros(m.nu, self._dtype), start_frame)
    reward, done, zero = jnp.zeros(3, self._dtype)
    metrics = {"pos_reward": zero, "reward_quadctrl": zero,
               "reward_alive": zero}
    return State(data, obs, reward, done, metrics, info)

  def step(self, state: State, action: jax.Array) -> State:
    action = jnp.asarray(action, self._dtype)
    data0 = state.pipeline_state
    data = self.pipeline_step(data0, action)

    info = dict(state.info)
    info["cur_frame"] = info["cur_frame"] + 1

    # NOTE: pre-increment frame on purpose (reference off-by-one, :110)
    reward_frame = info["cur_frame"] if self._fix_quirks \
        else state.info["cur_frame"]
    pos_reward = jnp.exp(
        -100.0 * jnp.linalg.norm(
            data.qpos[:3] - self._track_pos[reward_frame]))

    min_z, max_z = self._healthy_z_range
    is_healthy = jnp.where(data.qpos[2] < min_z, 0.0, 1.0)
    is_healthy = jnp.where(data.qpos[2] > max_z, 0.0,
                           is_healthy).astype(self._dtype)
    if self._terminate_when_unhealthy:
      healthy_reward = jnp.asarray(self._healthy_reward, self._dtype)
    else:
      healthy_reward = self._healthy_reward * is_healthy

    ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

    obs = self._get_obs(data, action, info["cur_frame"])
    reward = pos_reward + healthy_reward - ctrl_cost
    done = 1.0 - is_healthy if self._terminate_when_unhealthy else \
        jnp.zeros((), self._dtype)
    metrics = dict(state.metrics)
    metrics.update(pos_reward=pos_reward, reward_quadctrl=-ctrl_cost,
                   reward_alive=healthy_reward)
    return state.replace(pipeline_state=data, obs=obs, reward=reward,
                         done=done, metrics=metrics, info=info)

  def _get_obs(self, data: Data, action: jax.Array,
               cur_frame: jax.Array) -> jax.Array:
    """qpos‖qvel‖cinert[1:]‖cvel[1:]‖qfrc_actuator‖local tracking vector.

    The +1 lookahead relies on JAX clamping out-of-range gather indices
    (cur_frame can reach clip_len at episode end), matching the reference.
    """
    track_pos_local = self._to_local(
        data, self._track_pos[cur_frame + 1] - data.qpos[:3])
    return jnp.concatenate([
        data.qpos,
        data.qvel,
        data.cinert[1:].ravel(),
        data.cvel[1:].ravel(),
        data.qfrc_actuator,
        track_pos_local.ravel(),
    ])

  def _to_local(self, data: Data, vec_world: jax.Array) -> jax.Array:
    """Rotate a world vector by body 1's rotation matrix (emil_to_local,
    Rodent_Env_Brax.py:160-162 — note: xmat @ v, not xmat.T @ v)."""
    return data.xmat[1] @ vec_world
