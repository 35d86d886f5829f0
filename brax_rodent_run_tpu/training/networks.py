"""PPO policy/value networks + inference-fn factory.

Matches the architecture the reference trains (brax ppo defaults, exercised
at brax_rodent_run_ppo.py:97-114 and rebuilt in render_rollout.ipynb cell 3):

- policy: MLP hidden (32, 32, 32, 32), swish, emitting 2*action_size logits
  for a NormalTanhDistribution
- value:  MLP hidden (256,)*5, swish, scalar output
- observations normalized by running statistics before both nets

TPU notes: these are small dense stacks — each layer is one MXU matmul over
the (minibatch*unroll) batch; everything fuses into the surrounding jitted
training step. Params live in f32; matmuls can run bf16 via
``jax.default_matmul_precision`` without touching this code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen
from flax import struct

from brax_rodent_run_tpu.training import distribution
from brax_rodent_run_tpu.training import running_statistics as rs


@struct.dataclass
class PPONetworkParams:
  policy: Any
  value: Any


class MLP(linen.Module):
  layer_sizes: Sequence[int]
  activation: Callable[[jax.Array], jax.Array] = linen.swish
  kernel_init: Callable = jax.nn.initializers.lecun_uniform()
  activate_final: bool = False

  @linen.compact
  def __call__(self, x: jax.Array) -> jax.Array:
    for i, size in enumerate(self.layer_sizes):
      x = linen.Dense(size, kernel_init=self.kernel_init,
                      name=f"hidden_{i}")(x)
      if i != len(self.layer_sizes) - 1 or self.activate_final:
        x = self.activation(x)
    return x


@dataclasses.dataclass(frozen=True)
class PPONetworks:
  policy_module: MLP
  value_module: MLP
  action_distribution: distribution.NormalTanhDistribution
  observation_size: int

  def init(self, key: jax.Array) -> PPONetworkParams:
    kp, kv = jax.random.split(key)
    dummy = jnp.zeros((1, self.observation_size))
    return PPONetworkParams(
        policy=self.policy_module.init(kp, dummy),
        value=self.value_module.init(kv, dummy),
    )

  def policy_logits(self, policy_params, norm_obs: jax.Array) -> jax.Array:
    return self.policy_module.apply(policy_params, norm_obs)

  def value(self, value_params, norm_obs: jax.Array) -> jax.Array:
    return jnp.squeeze(self.value_module.apply(value_params, norm_obs),
                       axis=-1)


def make_ppo_networks(
    observation_size: int,
    action_size: int,
    policy_hidden_layer_sizes: Sequence[int] = (32, 32, 32, 32),
    value_hidden_layer_sizes: Sequence[int] = (256,) * 5,
    activation: Callable[[jax.Array], jax.Array] = linen.swish,
) -> PPONetworks:
  dist = distribution.NormalTanhDistribution(event_size=action_size)
  policy = MLP(layer_sizes=list(policy_hidden_layer_sizes)
               + [dist.param_size], activation=activation)
  value = MLP(layer_sizes=list(value_hidden_layer_sizes) + [1],
              activation=activation)
  return PPONetworks(policy_module=policy, value_module=value,
                     action_distribution=dist,
                     observation_size=observation_size)


# Params bundle saved to disk / passed to make_policy:
#   (normalizer_state, policy_params, value_params)
# — same triple the reference round-trips through brax.io.model
# (brax_rodent_run_ppo.py:138,205; render_rollout.ipynb cells 3-4).
PolicyParams = Tuple[rs.RunningStatisticsState, Any, Any]


def make_inference_fn(networks: PPONetworks):
  """Returns make_policy(params, deterministic=False) -> policy fn.

  policy(obs, rng) -> (action, extras) with extras carrying the raw
  (pre-tanh) action and its log-prob, as the PPO loss requires.
  """

  def make_policy(params: PolicyParams, deterministic: bool = False):
    normalizer_state, policy_params = params[0], params[1]
    dist = networks.action_distribution

    def policy(obs: jax.Array, key: jax.Array):
      norm_obs = rs.normalize(obs, normalizer_state)
      logits = networks.policy_logits(policy_params, norm_obs)
      if deterministic:
        return dist.mode(logits), {}
      raw = dist.sample_no_postprocessing(logits, key)
      log_prob = dist.log_prob(logits, raw)
      return dist.postprocess(raw), {"raw_action": raw,
                                     "log_prob": log_prob}

    return policy

  return make_policy
