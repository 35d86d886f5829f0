"""BASELINE-shape acceptance tests (VERDICT.md r1 #7).

- config 2: 256-env vectorized lockstep with auto-reset on rodent_0.xml
  (the reference's `vmap`d training env at its published batch shape,
  readme.md:33 / BASELINE.json config 2).
- config 4: a humanoid PPO run long enough to assert the reward actually
  improves (not just finiteness) — the learning-curve acceptance the
  400-step smoke test cannot give.
Both are slow-marked; run with `pytest -m slow tests/test_scale.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import load_mj_path
from brax_rodent_run_tpu import envs
from brax_rodent_run_tpu.envs.wrappers import wrap_for_training
from brax_rodent_run_tpu.training import ppo


@pytest.mark.slow
def test_rodent0_256env_lockstep_autoreset():
  """256 rodent_0 envs stepping in lockstep under the training wrappers:
  per-env episode bookkeeping stays consistent while early terminations
  (falls) and truncations auto-reset independently."""
  num_envs = 256
  episode_length = 4
  m = load_mj_path(model_path("rodent_0.xml"), solver="cg",
                   iterations=8, ls_iterations=8)
  track = jnp.array(np.cumsum(np.ones((260, 3)) * 0.002, axis=0),
                    jnp.float32)
  env = envs.get_environment("rodent", model=m, track_pos=track)
  wenv = wrap_for_training(env, episode_length=episode_length)

  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(wenv.reset)(rng)
  assert state.obs.shape == (num_envs, env.observation_size)
  first_qpos = np.asarray(state.info["first_pipeline_state"].qpos)
  first_obs = np.asarray(state.info["first_obs"])

  step = jax.jit(wenv.step)
  key = jax.random.PRNGKey(1)
  saw_done = np.zeros(num_envs, bool)
  for t in range(1, episode_length + 2):
    key, akey = jax.random.split(key)
    action = jax.random.uniform(
        akey, (num_envs, env.action_size), jnp.float32, -0.5, 0.5)
    prev_steps = np.asarray(state.info["steps"])
    state = step(state, action)
    steps = np.asarray(state.info["steps"])
    done = np.asarray(state.done).astype(bool)
    trunc = np.asarray(state.info["truncation"])
    obs = np.asarray(state.obs)
    qpos = np.asarray(state.pipeline_state.qpos)

    assert np.all(np.isfinite(obs)), t
    # lockstep step counter: every env advanced by exactly 1 from its
    # own (possibly reset) counter
    assert np.all((steps == prev_steps + 1) | (prev_steps >= episode_length)
                  | (steps == 1)), t
    assert np.all(steps <= episode_length)
    # truncation only where done fired at the horizon
    assert np.all(trunc[~done] == 0.0), t
    # where done fired, the cached FIRST state was restored exactly
    if done.any():
      np.testing.assert_array_equal(qpos[done], first_qpos[done])
      np.testing.assert_array_equal(obs[done], first_obs[done])
    # where not done, the sim advanced away from the cached reset state
    alive = ~done & (np.abs(qpos - first_qpos).max(axis=1) > 0)
    assert alive.sum() > 0 or done.all(), t
    saw_done |= done
  # the horizon guarantees every env finished at least one episode
  assert saw_done.all()


@pytest.mark.slow
def test_ppo_humanoid_learns():
  """Humanoid PPO at meaningful scale: eval episode reward must IMPROVE
  over training (BASELINE config 4's learning-curve acceptance scaled to
  the CPU test rig)."""
  m = load_mj_path(model_path("humanoid.xml"))
  env = envs.get_environment("humanoid", model=m, n_frames=2)
  progress = []
  _, params, _ = ppo.train(
      environment=env,
      num_timesteps=120_000,
      episode_length=150,
      num_envs=64,
      num_eval_envs=64,
      learning_rate=3e-4,
      entropy_cost=1e-3,
      discounting=0.97,
      unroll_length=10,
      batch_size=64,
      num_minibatches=8,
      num_updates_per_batch=4,
      num_evals=3,
      normalize_observations=True,
      seed=2,
      progress_fn=lambda steps, mets: progress.append(
          (steps, float(mets["eval/episode_reward"]))),
  )
  assert len(progress) == 3
  rewards = [r for _, r in progress]
  assert all(np.isfinite(r) for r in rewards), rewards
  # learning-curve acceptance: clearly better than the untrained policy
  assert rewards[-1] > rewards[0] * 1.2, rewards
  leaves = jax.tree_util.tree_leaves((params[1], params[2]))
  assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
