"""Action distributions for policy networks.

``NormalTanhDistribution`` reproduces the behavioral contract of the
distribution the reference's PPO uses (brax NormalTanhDistribution, exercised
via ppo.train at brax_rodent_run_ppo.py:97-114 and rebuilt at eval time in
render_rollout.ipynb cell 3): a diagonal Gaussian parameterized by
(loc, softplus(scale) + min_std), squashed through tanh, with the change-of-
variables log-det correction. ``deterministic`` mode is tanh(loc)
(make_policy(params, deterministic=True), brax_rodent_run_ppo.py:139).

Everything is elementwise VPU work and fuses into the surrounding jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class NormalTanhDistribution:
  """tanh(Normal(loc, softplus(scale)+min_std)) with diagonal covariance.

  The policy network emits 2*event_size logits: [loc, scale_logits].
  """

  def __init__(self, event_size: int, min_std: float = 0.001,
               var_scale: float = 1.0):
    self.event_size = event_size
    self.min_std = min_std
    self.var_scale = var_scale

  @property
  def param_size(self) -> int:
    return 2 * self.event_size

  def _loc_scale(self, logits: jax.Array):
    loc, scale_logits = jnp.split(logits, 2, axis=-1)
    scale = (jax.nn.softplus(scale_logits) + self.min_std) * self.var_scale
    return loc, scale

  def sample_no_postprocessing(self, logits: jax.Array,
                               seed: jax.Array) -> jax.Array:
    """Pre-tanh sample (the 'raw action' stored in rollouts)."""
    loc, scale = self._loc_scale(logits)
    return loc + scale * jax.random.normal(seed, loc.shape, loc.dtype)

  def sample(self, logits: jax.Array, seed: jax.Array) -> jax.Array:
    return self.postprocess(self.sample_no_postprocessing(logits, seed))

  def mode(self, logits: jax.Array) -> jax.Array:
    loc, _ = self._loc_scale(logits)
    return jnp.tanh(loc)

  def postprocess(self, pre_tanh: jax.Array) -> jax.Array:
    return jnp.tanh(pre_tanh)

  def log_prob(self, logits: jax.Array, pre_tanh: jax.Array) -> jax.Array:
    """log p(tanh(x)) for a pre-tanh sample x, summed over the event axis."""
    loc, scale = self._loc_scale(logits)
    base = (-0.5 * jnp.square((pre_tanh - loc) / scale)
            - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(scale))
    # log|d tanh(x)/dx| = log(1 - tanh(x)^2) = 2*(log2 - x - softplus(-2x))
    log_det = 2.0 * (jnp.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
    return jnp.sum(base - log_det, axis=-1)

  def entropy(self, logits: jax.Array, seed: jax.Array) -> jax.Array:
    """Gaussian entropy + E[log-det] estimated with one tanh sample."""
    loc, scale = self._loc_scale(logits)
    gauss = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi)) + jnp.log(scale)
    x = loc + scale * jax.random.normal(seed, loc.shape, loc.dtype)
    log_det = 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))
    return jnp.sum(gauss + log_det, axis=-1)
