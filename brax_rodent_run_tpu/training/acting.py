"""Rollout collection + evaluation, fully on-device.

``generate_unroll`` is the trainer's hot rollout path: a ``lax.scan`` over
env.step whose body runs the batched physics substeps and the policy MLP —
one XLA computation, no host round-trips (the reference delegates this to
brax's acting.generate_unroll inside ppo.train, SURVEY.md §3.1).

``Evaluator`` reproduces the trainer's eval episodes: a fixed-length scan of
episode_length steps on a dedicated batch of eval envs, aggregating episode
reward/length and the env's custom metrics.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_rodent_run_tpu.envs.base import Env, State

Policy = Callable[[jax.Array, jax.Array], Tuple[jax.Array, Dict[str, Any]]]


@struct.dataclass
class Transition:
  """Rollout step data. The successor observation is NOT stored per
  step: PPO's GAE only bootstraps from the LAST next-observation of
  each unroll sequence (losses.compute_ppo_loss takes it separately as
  ``final_observation``). Dropping the per-step copy halves rollout
  buffer memory — the difference between the reference's 1024-envs/GPU
  batch fitting on a 16 GB chip or not (cf. readme.md:33's A40 caveat).
  """
  observation: jax.Array
  action: jax.Array
  reward: jax.Array
  discount: jax.Array
  extras: Dict[str, Any]


def actor_step(env: Env, state: State, policy: Policy, key: jax.Array,
               extra_fields: Sequence[str] = ()) -> Tuple[State, Transition]:
  action, policy_extras = policy(state.obs, key)
  nstate = env.step(state, action)
  state_extras = {f: nstate.info[f] for f in extra_fields}
  return nstate, Transition(
      observation=state.obs,
      action=action,
      reward=nstate.reward,
      discount=1.0 - nstate.done,
      extras={"policy_extras": policy_extras,
              "state_extras": state_extras},
  )


def generate_unroll(env: Env, state: State, policy: Policy, key: jax.Array,
                    unroll_length: int,
                    extra_fields: Sequence[str] = ()
                    ) -> Tuple[State, Transition]:
  """Scan ``unroll_length`` actor steps; transitions stacked on axis 0."""

  def f(carry, _):
    state, key = carry
    key, step_key = jax.random.split(key)
    nstate, transition = actor_step(env, state, policy, step_key,
                                    extra_fields=extra_fields)
    return (nstate, key), transition

  (final_state, _), data = jax.lax.scan(f, (state, key), (),
                                        length=unroll_length)
  return final_state, data


class Evaluator:
  """Runs full eval episodes and aggregates metrics.

  Mirrors the eval protocol the reference's progress metrics come from
  (eval/episode_reward etc. logged via wandb_progress,
  brax_rodent_run_ppo.py:130-132): num_eval_envs episodes of exactly
  episode_length steps (the wrapped env truncates there), reward/length
  summed until first done.
  """

  def __init__(self, eval_env: Env, eval_policy_fn: Callable[[Any], Policy],
               num_eval_envs: int, episode_length: int, action_repeat: int,
               key: jax.Array):
    self._key = key
    self._eval_steps = episode_length // action_repeat
    self._num_eval_envs = num_eval_envs
    self._steps_per_eval = num_eval_envs * episode_length

    batched_reset = jax.vmap(eval_env.reset)
    batched_step = jax.vmap(eval_env.step)

    def eval_fn(params, key):
      reset_keys = jax.random.split(key, num_eval_envs)
      policy = eval_policy_fn(params)
      state = batched_reset(reset_keys)

      def step(carry, _):
        state, key, ep_reward, ep_len, ep_metrics, active = carry
        key, akey = jax.random.split(key)
        akeys = jax.random.split(akey, num_eval_envs)
        action, _ = jax.vmap(policy)(state.obs, akeys)
        nstate = batched_step(state, action)
        ep_reward = ep_reward + nstate.reward * active
        ep_len = ep_len + active
        # custom State.metrics masked by episode activity, matching
        # brax's EvalWrapper — steps after done must not inflate
        # eval/episode_* for early-terminating episodes
        ep_metrics = {k: ep_metrics[k] + v * active
                      for k, v in nstate.metrics.items()}
        active = active * (1.0 - nstate.done)
        return (nstate, key, ep_reward, ep_len, ep_metrics, active), None

      zeros = jnp.zeros((num_eval_envs,))
      metric_zeros = {k: jnp.zeros((num_eval_envs,))
                      for k in state.metrics.keys()}
      (state, _, ep_reward, ep_len, ep_metrics, _), _ = jax.lax.scan(
          step, (state, key, zeros, zeros, metric_zeros,
                 jnp.ones((num_eval_envs,))),
          (), length=self._eval_steps)
      out = {"eval/episode_reward": jnp.mean(ep_reward),
             "eval/episode_reward_std": jnp.std(ep_reward),
             "eval/avg_episode_length": jnp.mean(ep_len)}
      for k, v in ep_metrics.items():
        out[f"eval/episode_{k}"] = jnp.mean(v)
      return out

    self._eval_fn = jax.jit(eval_fn)

  def run_evaluation(self, params) -> Dict[str, float]:
    self._key, key = jax.random.split(self._key)
    t = time.perf_counter()
    metrics = jax.device_get(self._eval_fn(params, key))
    dt = time.perf_counter() - t
    metrics = {k: float(v) for k, v in metrics.items()}
    metrics["eval/walltime"] = dt
    metrics["eval/sps"] = self._steps_per_eval / dt
    return metrics
