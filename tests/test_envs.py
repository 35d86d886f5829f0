"""Env layer tests: reset/step contracts, obs dims, wrappers, auto-reset
invariants (BASELINE config 2: vectorized lockstep with auto-reset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import load_mj_path
from brax_rodent_run_tpu import envs
from brax_rodent_run_tpu.envs.wrappers import wrap_for_training


@pytest.fixture(scope="module")
def rodent_env():
  m = load_mj_path(model_path("rodent_new.xml"), solver="cg",
                   iterations=8, ls_iterations=8)
  track = jnp.array(np.cumsum(np.ones((260, 3)) * 0.002, axis=0),
                    jnp.float32)
  return envs.get_environment("rodent", model=m, track_pos=track)


@pytest.fixture(scope="module")
def humanoid_env():
  m = load_mj_path(model_path("humanoid.xml"))
  return envs.get_environment("humanoid", model=m)


def test_rodent_obs_dim(rodent_env):
  # 1279 = qpos 74 + qvel 73 + cinert 660 + cvel 396 + qfrc 73 + track 3
  # (SURVEY.md §6, computed from Rodent_Env_Brax.py:149-158)
  assert rodent_env.observation_size == 1279
  state = jax.jit(rodent_env.reset)(jax.random.PRNGKey(0))
  assert state.obs.shape == (1279,)
  assert float(state.done) == 0.0
  assert set(state.metrics) == {"pos_reward", "reward_quadctrl",
                                "reward_alive"}


def test_rodent_step(rodent_env):
  state = jax.jit(rodent_env.reset)(jax.random.PRNGKey(1))
  step = jax.jit(rodent_env.step)
  s2 = step(state, jnp.zeros(rodent_env.action_size))
  assert s2.info["cur_frame"] == state.info["cur_frame"] + 1
  assert np.isfinite(float(s2.reward))
  assert np.all(np.isfinite(np.asarray(s2.obs)))
  # dt contract: 10 substeps x 0.002 = 0.02 (fps of tracking data)
  assert abs(rodent_env.dt - 0.02) < 1e-12


def test_humanoid_step(humanoid_env):
  state = jax.jit(humanoid_env.reset)(jax.random.PRNGKey(0))
  step = jax.jit(humanoid_env.step)
  s2 = step(state, jnp.zeros(humanoid_env.action_size))
  assert np.isfinite(float(s2.reward))
  assert state.obs.shape == (humanoid_env.observation_size,)


def test_wrapped_batch_autoreset(humanoid_env):
  batch = 4
  env = wrap_for_training(humanoid_env, episode_length=5)
  rng = jax.random.split(jax.random.PRNGKey(0), batch)
  state = jax.jit(env.reset)(rng)
  assert state.obs.shape == (batch, humanoid_env.observation_size)
  step = jax.jit(env.step)
  first_obs = np.asarray(state.info["first_obs"])
  for t in range(6):
    state = step(state, jnp.zeros((batch, humanoid_env.action_size)))
  # after episode_length steps everything was done once and auto-reset:
  # steps counter restarted and obs returned to the cached first obs
  assert np.all(np.asarray(state.info["steps"]) <= 5)
  # at the step where done fired, obs == first_obs was restored; since the
  # humanoid at qpos0 with zero actions doesn't fall in 5*5 substeps, done
  # came from truncation
  assert np.all(np.asarray(state.info["truncation"]) >= 0)
  assert np.all(np.isfinite(np.asarray(state.obs)))


def test_lean_autoreset_matches_classic(humanoid_env):
  """LeanAutoResetWrapper's OBSERVABLE behavior (qpos/qvel/act/obs/
  reward/done/steps) must equal classic AutoResetWrapper step-for-step,
  including across auto-resets (Humanoid declares autoreset_carry_fields,
  so this also audits that declaration — envs/validate.py)."""
  from brax_rodent_run_tpu.envs.validate import (
      assert_lean_autoreset_equivalent)
  assert_lean_autoreset_equivalent(humanoid_env)


@pytest.mark.slow
def test_lean_autoreset_matches_classic_rodent(rodent_env):
  """The production bench/training combo is Rodent + lean_autoreset; the
  flagship env must pass the same audit (ADVICE r2: a new env forgetting
  autoreset_carry_fields silently computes its first post-reset reward
  from the pre-reset trajectory)."""
  from brax_rodent_run_tpu.envs.validate import (
      assert_lean_autoreset_equivalent)
  assert_lean_autoreset_equivalent(rodent_env, episode_length=2, batch=2,
                                   n_steps=5)


def test_autoreset_restores_first_state(humanoid_env):
  env = wrap_for_training(humanoid_env, episode_length=3)
  rng = jax.random.split(jax.random.PRNGKey(7), 2)
  state = jax.jit(env.reset)(rng)
  step = jax.jit(env.step)
  s = state
  for _ in range(3):
    s = step(s, jnp.zeros((2, humanoid_env.action_size)))
  # done fired at step 3 (truncation) -> pipeline_state === cached first
  np.testing.assert_allclose(
      np.asarray(s.pipeline_state.qpos),
      np.asarray(state.info["first_pipeline_state"].qpos), atol=0)
  np.testing.assert_allclose(np.asarray(s.obs),
                             np.asarray(state.info["first_obs"]), atol=0)
