"""Torch-facing environment wrapper.

The reference ships a TorchRL bridge (torch_utils.py:47 BraxWrapper +
ParallelEnv workers) that was left broken/vestigial (SURVEY.md §2.1
"TorchRL training (vestigial)"). This is the working equivalent for our
stack: the whole batch steps as ONE jitted JAX program on the device
(no Python env workers — SURVEY.md §7 "no collector/learner split") and
tensors cross the torch boundary via dlpack (zero-copy on CPU).

API is gym-vector-like:

    env = TorchBatchEnv(make_env(), num_envs=512, episode_length=150)
    obs = env.reset(seed=0)                      # torch.FloatTensor (N, O)
    obs, reward, done, info = env.step(actions)  # torch tensors

Auto-reset is inherited from the training wrappers, so `done` marks
episode boundaries but stepping never stalls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


def _to_torch(x):
  import torch
  import numpy as np
  return torch.from_numpy(np.asarray(x))


class TorchBatchEnv:
  """Batched lockstep env with a torch tensor interface."""

  def __init__(self, env, num_envs: int, episode_length: int = 1000,
               action_repeat: int = 1, device: str = "cpu"):
    import jax
    from brax_rodent_run_tpu.envs.wrappers import wrap_for_training

    self._num_envs = num_envs
    self._device = device
    self._env = wrap_for_training(env, episode_length=episode_length,
                                  action_repeat=action_repeat)
    self._reset = jax.jit(self._env.reset)
    self._step = jax.jit(self._env.step)
    self._state = None
    self.observation_size = env.observation_size
    self.action_size = env.action_size

  @property
  def num_envs(self) -> int:
    return self._num_envs

  def reset(self, seed: int = 0):
    import jax
    rng = jax.random.split(jax.random.PRNGKey(seed), self._num_envs)
    self._state = self._reset(rng)
    return _to_torch(self._state.obs).to(self._device)

  def step(self, actions) -> Tuple[Any, Any, Any, Dict[str, Any]]:
    import jax.numpy as jnp
    assert self._state is not None, "call reset() first"
    act = jnp.asarray(actions.detach().cpu().numpy())
    self._state = self._step(self._state, act)
    obs = _to_torch(self._state.obs).to(self._device)
    reward = _to_torch(self._state.reward).to(self._device)
    done = _to_torch(self._state.done).to(self._device)
    info = {k: _to_torch(v).to(self._device)
            for k, v in self._state.metrics.items()}
    return obs, reward, done, info
