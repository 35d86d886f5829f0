"""Streaming observation normalization (Welford running mean/std).

Contract: the reference trains with normalize_observations=True
(brax_rodent_run_ppo.py:103) through brax's acme running_statistics, whose
state (mean/std/count) is part of the saved params bundle and is required to
rebuild the inference fn (render_rollout.ipynb cell 3; SURVEY.md §2.3).

TPU notes: the update is a pure batched reduction (mean over all leading
axes) followed by an optional ``lax.pmean`` over the data-parallel mesh axis
so every shard holds identical statistics — replicated state, ICI-reduced
deltas, no host involvement.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStatisticsState:
  count: jax.Array        # () accumulated element count (float for pmean)
  mean: Any               # pytree matching the observation
  summed_variance: Any    # pytree: sum of squared deviations
  std: Any                # pytree: derived std (cached for fast normalize)


def init_state(specimen: jax.Array) -> RunningStatisticsState:
  """Initialize from a specimen (zeros_like the observation)."""
  dtype = specimen.dtype
  return RunningStatisticsState(
      count=jnp.zeros((), dtype),
      mean=jnp.zeros_like(specimen),
      summed_variance=jnp.zeros_like(specimen),
      std=jnp.ones_like(specimen),
  )


def update(state: RunningStatisticsState, batch: jax.Array,
           pmap_axis_name: Optional[str] = None,
           std_min_value: float = 1e-6,
           std_max_value: float = 1e6) -> RunningStatisticsState:
  """Welford update over all leading batch axes of ``batch``."""
  batch_ndim = batch.ndim - state.mean.ndim
  batch_axes = tuple(range(batch_ndim))
  batch_count = 1
  for a in batch_axes:
    batch_count *= batch.shape[a]
  batch_count = jnp.asarray(batch_count, state.count.dtype)
  if pmap_axis_name is not None:
    batch_count = jax.lax.psum(batch_count, pmap_axis_name)

  count = state.count + batch_count

  diff_to_old_mean = batch - state.mean
  mean_update = jnp.sum(diff_to_old_mean, axis=batch_axes) / count
  if pmap_axis_name is not None:
    mean_update = jax.lax.psum(mean_update, pmap_axis_name)
  mean = state.mean + mean_update

  diff_to_new_mean = batch - mean
  var_update = jnp.sum(diff_to_old_mean * diff_to_new_mean, axis=batch_axes)
  if pmap_axis_name is not None:
    var_update = jax.lax.psum(var_update, pmap_axis_name)
  summed_variance = state.summed_variance + var_update

  std = jnp.sqrt(jnp.maximum(summed_variance / count, 0.0))
  std = jnp.clip(std, std_min_value, std_max_value)
  return RunningStatisticsState(
      count=count, mean=mean, summed_variance=summed_variance, std=std)


def normalize(batch: jax.Array,
              state: RunningStatisticsState) -> jax.Array:
  return (batch - state.mean) / state.std


def denormalize(batch: jax.Array,
                state: RunningStatisticsState) -> jax.Array:
  return batch * state.std + state.mean
