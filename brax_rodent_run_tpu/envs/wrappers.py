"""Env wrappers: episode bookkeeping, batching, auto-reset.

Semantics follow the brax training wrappers the reference's ppo.train
applies implicitly (SURVEY.md §2.3: EpisodeWrapper(episode_length=150,
action_repeat=1) → VmapWrapper(num_envs) → AutoResetWrapper), because the
trainer's episode/metric accounting depends on them:

- EpisodeWrapper: counts steps, sets done at episode_length, records
  info['truncation'] = 1 when terminated by time limit rather than failure.
- VmapWrapper: vmaps reset/step over a leading env axis.
- AutoResetWrapper: caches the first state at reset; where done, restores
  the cached pipeline_state/obs instead of re-running reset physics
  (no per-env reset recompute — the brax trick, SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.envs.base import Env, State


class Wrapper(Env):

  def __init__(self, env: Env):
    self.env = env

  def __getattr__(self, name):
    return getattr(self.env, name)

  @property
  def model(self):
    return self.env.model

  @property
  def sys(self):
    return self.env.sys

  @property
  def dt(self):
    return self.env.dt

  @property
  def observation_size(self):
    return self.env.observation_size

  @property
  def action_size(self):
    return self.env.action_size

  @property
  def autoreset_carry_fields(self):
    # explicit delegation: Wrapper subclasses Env, so the base-class
    # property would otherwise shadow the wrapped env's override
    return self.env.autoreset_carry_fields

  def reset(self, rng):
    return self.env.reset(rng)

  def step(self, state, action):
    return self.env.step(state, action)


class EpisodeWrapper(Wrapper):
  """Fixed-horizon episodes with truncation flag + action repeat."""

  def __init__(self, env: Env, episode_length: int, action_repeat: int = 1):
    super().__init__(env)
    self.episode_length = episode_length
    self.action_repeat = action_repeat

  def reset(self, rng):
    state = self.env.reset(rng)
    info = dict(state.info)
    info["steps"] = jnp.zeros((), jnp.int32)
    info["truncation"] = jnp.zeros((), state.reward.dtype)
    return state.replace(info=info)

  def step(self, state, action):
    def f(state, _):
      nstate = self.env.step(state, action)
      return nstate, nstate.reward

    state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
    state = state.replace(reward=jnp.sum(rewards, axis=0))
    steps = state.info["steps"] + self.action_repeat
    one = jnp.ones_like(state.done)
    zero = jnp.zeros_like(state.done)
    episode_length = jnp.array(self.episode_length, dtype=jnp.int32)
    done = jnp.where(steps >= episode_length, one, state.done)
    truncation = jnp.where(steps >= episode_length,
                           1.0 - state.done, zero)
    info = dict(state.info)
    info["steps"] = steps
    info["truncation"] = truncation
    return state.replace(done=done, info=info)


class VmapWrapper(Wrapper):
  """Batch reset/step over a leading env axis."""

  def __init__(self, env: Env, batch_size: int | None = None):
    super().__init__(env)
    self.batch_size = batch_size

  def reset(self, rng):
    if self.batch_size is not None and rng.ndim == 1:
      rng = jax.random.split(rng, self.batch_size)
    return jax.vmap(self.env.reset)(rng)

  def step(self, state, action):
    return jax.vmap(self.env.step)(state, action)


class AutoResetWrapper(Wrapper):
  """On done, restore the cached reset state (no reset physics re-run)."""

  def reset(self, rng):
    state = self.env.reset(rng)
    info = dict(state.info)
    info["first_pipeline_state"] = state.pipeline_state
    info["first_obs"] = state.obs
    return state.replace(info=info)

  def step(self, state, action):
    # clear done/reward like brax does so accumulated metrics stay clean
    if "steps" in state.info:
      steps = state.info["steps"]
      steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
      info = dict(state.info)
      info["steps"] = steps
      state = state.replace(info=info)
    state = state.replace(done=jnp.zeros_like(state.done))
    state = self.env.step(state, action)

    def where_done(x, y):
      done = state.done
      if done.ndim > 0:
        done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
      return jnp.where(done, x, y)

    pipeline_state = jax.tree_util.tree_map(
        where_done, state.info["first_pipeline_state"],
        state.pipeline_state)
    obs = where_done(state.info["first_obs"], state.obs)
    return state.replace(pipeline_state=pipeline_state, obs=obs)


_LEAN_FIELDS = ("qpos", "qvel", "act", "ctrl", "qfrc_applied", "time")


class LeanAutoResetWrapper(Wrapper):
  """AutoReset that caches/restores only the state-DEFINING pipeline
  fields (qpos, qvel, act, ctrl, qfrc_applied, time) plus obs.

  Training math is identical to AutoResetWrapper: the next
  pipeline_step recomputes every derived forward product from
  (qpos, qvel, act, ctrl), and obs is restored exactly. The difference
  is purely HBM traffic — the full-Data select (~30 leaves incl. the
  dense qM/qMinv matrices) shrinks to 6 leaves — and that derived
  fields of a just-auto-reset state hold the pre-reset step's values
  (stale-field contract, envs/base.pipeline_step)."""

  def _fields(self):
    # state-defining fields + any derived fields the env reads from the
    # PRE-step state (Env.autoreset_carry_fields contract)
    return _LEAN_FIELDS + tuple(self.env.autoreset_carry_fields)

  def reset(self, rng):
    state = self.env.reset(rng)
    info = dict(state.info)
    info["first_state_fields"] = {
        f: getattr(state.pipeline_state, f) for f in self._fields()}
    info["first_obs"] = state.obs
    return state.replace(info=info)

  def step(self, state, action):
    if "steps" in state.info:
      steps = state.info["steps"]
      steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
      info = dict(state.info)
      info["steps"] = steps
      state = state.replace(info=info)
    state = state.replace(done=jnp.zeros_like(state.done))
    state = self.env.step(state, action)

    def where_done(x, y):
      done = state.done
      if done.ndim > 0:
        done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
      return jnp.where(done, x, y)

    cached = state.info["first_state_fields"]
    ps = state.pipeline_state.replace(**{
        f: where_done(cached[f], getattr(state.pipeline_state, f))
        for f in self._fields()})
    obs = where_done(state.info["first_obs"], state.obs)
    return state.replace(pipeline_state=ps, obs=obs)


def wrap_for_training(env: Env, episode_length: int = 1000,
                      action_repeat: int = 1,
                      lean_autoreset: bool = False) -> Env:
  """EpisodeWrapper -> VmapWrapper -> AutoResetWrapper (brax order).

  ``lean_autoreset=True`` swaps in LeanAutoResetWrapper (production
  training path; identical observable training semantics, less HBM
  traffic per step)."""
  env = EpisodeWrapper(env, episode_length, action_repeat)
  env = VmapWrapper(env)
  env = (LeanAutoResetWrapper if lean_autoreset else AutoResetWrapper)(env)
  return env
