"""PPO loss: GAE + clipped surrogate + value + entropy terms.

Semantics track the loss the reference optimizes via brax's ppo.train with
its hyperparameters (brax_rodent_run_ppo.py:97-114): GAE with
discounting=0.97, lambda_=0.95, clipping epsilon 0.3, entropy_cost 1e-3,
reward_scaling 1, advantage normalization on. Truncated episodes (time
limit, info['truncation']) bootstrap from the value net instead of
terminating the return.

Shapes: minibatch data is (B, T, ...) sequences; GAE scans the time axis in
reverse. Value/policy net applications are (B*T, obs) MXU matmuls.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from brax_rodent_run_tpu.training import running_statistics as rs
from brax_rodent_run_tpu.training.acting import Transition
from brax_rodent_run_tpu.training.networks import PPONetworkParams, PPONetworks


def compute_gae(truncation: jax.Array, termination: jax.Array,
                rewards: jax.Array, values: jax.Array,
                bootstrap_value: jax.Array, lambda_: float = 0.95,
                discount: float = 0.99) -> Tuple[jax.Array, jax.Array]:
  """Generalized advantage estimation over the leading time axis.

  truncation/termination/rewards/values: (T, B); bootstrap_value: (B,).
  Returns (vs, advantages), both (T, B).
  """
  truncation_mask = 1.0 - truncation
  values_t_plus_1 = jnp.concatenate(
      [values[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0)
  deltas = rewards + discount * (1.0 - termination) * values_t_plus_1 - values
  deltas *= truncation_mask

  def body(carry, xs):
    acc = carry
    trunc_mask, termin, delta = xs
    acc = delta + discount * (1.0 - termin) * trunc_mask * lambda_ * acc
    return acc, acc

  _, vs_minus_v = jax.lax.scan(
      body, jnp.zeros_like(bootstrap_value),
      (truncation_mask, termination, deltas), reverse=True)

  vs = vs_minus_v + values
  vs_t_plus_1 = jnp.concatenate(
      [vs[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0)
  advantages = (rewards + discount * (1.0 - termination) * vs_t_plus_1
                - values) * truncation_mask
  return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


def compute_ppo_loss(
    params: PPONetworkParams,
    normalizer_state: rs.RunningStatisticsState,
    data: Transition,
    final_observation: jax.Array,
    rng: jax.Array,
    networks: PPONetworks,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
) -> Tuple[jax.Array, Dict[str, Any]]:
  """data leaves are (B, T, ...); final_observation is (B, obs) — the
  successor observation of each sequence's last step (the only one GAE
  bootstraps from). Loss averaged over the minibatch."""
  # put time first: (T, B, ...)
  data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), data)

  dist = networks.action_distribution
  norm_obs = rs.normalize(data.observation, normalizer_state)
  policy_logits = networks.policy_logits(params.policy, norm_obs)
  baseline = networks.value(params.value, norm_obs)

  # bootstrap from the sequence-final successor observation
  norm_last = rs.normalize(final_observation, normalizer_state)
  bootstrap_value = networks.value(params.value, norm_last)

  rewards = data.reward * reward_scaling
  truncation = data.extras["state_extras"]["truncation"]
  termination = (1.0 - data.discount) * (1.0 - truncation)

  raw_action = data.extras["policy_extras"]["raw_action"]
  behaviour_log_prob = data.extras["policy_extras"]["log_prob"]
  target_log_prob = dist.log_prob(policy_logits, raw_action)

  vs, advantages = compute_gae(
      truncation=truncation, termination=termination, rewards=rewards,
      values=baseline, bootstrap_value=bootstrap_value,
      lambda_=gae_lambda, discount=discounting)
  if normalize_advantage:
    advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

  log_ratio = target_log_prob - behaviour_log_prob
  ratio = jnp.exp(log_ratio)
  surrogate = ratio * advantages
  clipped = jnp.clip(ratio, 1.0 - clipping_epsilon,
                     1.0 + clipping_epsilon) * advantages
  policy_loss = -jnp.mean(jnp.minimum(surrogate, clipped))

  v_error = vs - baseline
  value_loss = 0.5 * 0.5 * jnp.mean(v_error * v_error)

  entropy = jnp.mean(dist.entropy(policy_logits, rng))
  entropy_loss = -entropy_cost * entropy

  total = policy_loss + value_loss + entropy_loss
  return total, {
      "total_loss": total,
      "policy_loss": policy_loss,
      "v_loss": value_loss,
      "entropy_loss": entropy_loss,
  }
