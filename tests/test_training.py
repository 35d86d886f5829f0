"""Trainer tests: distribution math, running stats, GAE, PPO learning on a
toy env, multi-device (8 fake CPU chips) sharded training, param round-trip.

SURVEY.md §4 gap-fill: the reference has NO tests; its trainer contract is
brax ppo semantics (brax_rodent_run_ppo.py:97-114). The toy-env learning
test is the fast proxy for BASELINE configs 3-4; test_ppo_humanoid_smoke
exercises the real physics path end to end.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct
from jax.sharding import Mesh

from tests.conftest import model_path
from brax_rodent_run_tpu.envs.base import Env, State
from brax_rodent_run_tpu.training import distribution, losses, ppo
from brax_rodent_run_tpu.training import networks as ppo_networks
from brax_rodent_run_tpu.training import running_statistics as rs
from brax_rodent_run_tpu.io import checkpoint


# ---------------------------------------------------------------- toy env
@struct.dataclass
class _ToyData:
  pos: jax.Array


class PointMass(Env):
  """2-D point mass; reward = -|pos|; actions displace the mass."""

  def __init__(self):
    self._dtype = jnp.float32

  @property
  def observation_size(self):
    return 2

  @property
  def action_size(self):
    return 2

  @property
  def dt(self):
    return 0.05

  def reset(self, rng):
    pos = jax.random.uniform(rng, (2,), jnp.float32, -1.0, 1.0)
    zero = jnp.zeros((), jnp.float32)
    return State(_ToyData(pos=pos), pos, zero, zero, {"dist": zero}, {})

  def step(self, state, action):
    # cast: under the x64 test config the policy net runs f64 but the env
    # state is f32 (mirrors the real envs, which cast ctrl in pipeline_step)
    pos = (state.pipeline_state.pos
           + 0.1 * jnp.tanh(action)).astype(jnp.float32)
    reward = -jnp.linalg.norm(pos).astype(jnp.float32)
    return state.replace(pipeline_state=_ToyData(pos=pos), obs=pos,
                         reward=reward,
                         metrics={"dist": jnp.linalg.norm(pos).astype(
                             jnp.float32)})


# ------------------------------------------------------------ distribution
def test_normal_tanh_distribution():
  dist = distribution.NormalTanhDistribution(event_size=3)
  logits = jnp.array([0.5, -0.2, 0.1, 0.0, -1.0, 1.0])  # loc | scale
  key = jax.random.PRNGKey(0)
  raw = dist.sample_no_postprocessing(logits, key)
  action = dist.postprocess(raw)
  assert np.all(np.abs(np.asarray(action)) <= 1.0)
  assert np.all(np.abs(np.asarray(dist.mode(logits))) <= 1.0)

  # log_prob vs numerical: Monte-Carlo normalization sanity on 1-D case
  d1 = distribution.NormalTanhDistribution(event_size=1)
  lg = jnp.array([0.3, 0.2])
  xs = jnp.linspace(-6, 6, 20001)[:, None]
  lp = jax.vmap(lambda x: d1.log_prob(lg, x))(xs)
  # integral of p(tanh(x)) * d tanh(x) over x = 1
  dtanh = 1 - jnp.tanh(xs[:, 0]) ** 2
  integral = jnp.trapezoid(jnp.exp(lp) * dtanh, xs[:, 0])
  assert abs(float(integral) - 1.0) < 1e-3


def test_running_statistics_matches_numpy():
  key = jax.random.PRNGKey(0)
  batches = [jax.random.normal(jax.random.fold_in(key, i), (50, 4)) * 3 + i
             for i in range(5)]
  state = rs.init_state(jnp.zeros(4))
  for b in batches:
    state = rs.update(state, b)
  allb = np.concatenate([np.asarray(b) for b in batches])
  np.testing.assert_allclose(np.asarray(state.mean), allb.mean(0), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(state.std), allb.std(0), rtol=1e-4)
  normed = rs.normalize(jnp.asarray(allb), state)
  np.testing.assert_allclose(np.asarray(normed).mean(0), 0.0, atol=1e-5)


def test_gae_matches_reference_impl():
  T, B = 7, 3
  key = jax.random.PRNGKey(1)
  k1, k2, k3 = jax.random.split(key, 3)
  rewards = jax.random.normal(k1, (T, B))
  values = jax.random.normal(k2, (T, B))
  bootstrap = jax.random.normal(k3, (B,))
  termination = jnp.zeros((T, B)).at[4, 1].set(1.0)
  truncation = jnp.zeros((T, B)).at[6, 0].set(1.0)
  lam, disc = 0.95, 0.97

  vs, adv = losses.compute_gae(truncation, termination, rewards, values,
                               bootstrap, lambda_=lam, discount=disc)

  # naive python reference
  vals = np.asarray(jnp.concatenate([values, bootstrap[None]], 0))
  r = np.asarray(rewards)
  term = np.asarray(termination)
  trunc = np.asarray(truncation)
  acc = np.zeros(B)
  out = np.zeros((T, B))
  for t in reversed(range(T)):
    delta = (r[t] + disc * (1 - term[t]) * vals[t + 1] - vals[t])
    delta = delta * (1 - trunc[t])
    acc = delta + disc * (1 - term[t]) * (1 - trunc[t]) * lam * acc
    out[t] = acc
  vs_ref = out + np.asarray(values)
  np.testing.assert_allclose(np.asarray(vs), vs_ref, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------- trainer
def test_ppo_learns_point_mass():
  env = PointMass()
  progress = []
  make_policy, params, metrics = ppo.train(
      environment=env,
      num_timesteps=80_000,
      episode_length=40,
      num_envs=32,
      num_eval_envs=32,
      learning_rate=3e-3,
      entropy_cost=1e-3,
      discounting=0.95,
      unroll_length=10,
      batch_size=32,
      num_minibatches=4,
      num_updates_per_batch=4,
      num_evals=3,
      normalize_observations=True,
      seed=0,
      progress_fn=lambda steps, m: progress.append(
          (steps, m["eval/episode_reward"])),
  )
  assert len(progress) == 3
  first, last = progress[0][1], progress[-1][1]
  assert last > first + 2.0, (first, last)

  # inference fn contract: policy(obs, rng) -> (action, extras)
  policy = make_policy(params, deterministic=True)
  act, extras = jax.jit(policy)(jnp.zeros(2), jax.random.PRNGKey(0))
  assert act.shape == (2,)


def test_ppo_multidevice_mesh():
  assert jax.device_count() == 8
  mesh = Mesh(np.asarray(jax.devices()), ("data",))
  env = PointMass()
  make_policy, params, metrics = ppo.train(
      environment=env,
      num_timesteps=5_000,
      episode_length=20,
      num_envs=16,          # 2 per fake chip
      num_eval_envs=8,
      learning_rate=1e-3,
      unroll_length=5,
      batch_size=16,
      num_minibatches=5,
      num_updates_per_batch=2,
      num_evals=2,
      normalize_observations=True,
      seed=1,
      mesh=mesh,
  )
  leaves = jax.tree_util.tree_leaves((params[1], params[2]))
  assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
  assert np.isfinite(metrics["eval/episode_reward"])


def test_shard_map_matches_vmap_semantics():
  """Numerical parity of the production shard_map SPMD program against the
  single-device vmap-with-axis-name reference: same mesh shape, same keys,
  same math — final params must agree (distributed-correctness assertion
  the README promises)."""
  mesh = Mesh(np.asarray(jax.devices()), ("data",))
  kwargs = dict(
      num_timesteps=2_000,
      episode_length=20,
      num_envs=16,
      num_eval_envs=8,
      learning_rate=1e-3,
      unroll_length=5,
      batch_size=16,
      num_minibatches=5,
      num_updates_per_batch=2,
      num_evals=1,
      normalize_observations=True,
      seed=7,
      mesh=mesh,
  )
  _, params_sm, _ = ppo.train(environment=PointMass(),
                              spmd_mode="shard_map", **kwargs)
  _, params_vm, _ = ppo.train(environment=PointMass(),
                              spmd_mode="vmap", **kwargs)
  for a, b in zip(jax.tree_util.tree_leaves(params_sm),
                  jax.tree_util.tree_leaves(params_vm)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_epoch_scan_matches_host_loop():
  """epoch_scan=True (one device-side lax.scan per epoch) must produce
  bit-identical params to the host-stepped epoch loop (same fold_in key
  schedule, same carry)."""
  kwargs = dict(
      environment=PointMass(), num_timesteps=4 * 8 * 2 * 4,
      episode_length=8, num_envs=8, num_eval_envs=8, learning_rate=1e-3,
      unroll_length=4, batch_size=8, num_minibatches=2,
      num_updates_per_batch=1, normalize_observations=True, seed=5,
      num_evals=2,
  )
  _, params_loop, _ = ppo.train(epoch_scan=False, **kwargs)
  _, params_scan, _ = ppo.train(epoch_scan=True, **kwargs)
  for a, b in zip(jax.tree_util.tree_leaves(params_loop),
                  jax.tree_util.tree_leaves(params_scan)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_checkpoint_roundtrip(tmp_path):
  networks = ppo_networks.make_ppo_networks(observation_size=4,
                                            action_size=2)
  params = networks.init(jax.random.PRNGKey(0))
  bundle = (rs.init_state(jnp.zeros(4)), params.policy, params.value)
  path = str(tmp_path / "params.ckpt")
  checkpoint.save_params(path, bundle)
  restored = checkpoint.load_params(path, target=bundle)
  for a, b in zip(jax.tree_util.tree_leaves(bundle),
                  jax.tree_util.tree_leaves(restored)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  # loaded params drive the policy identically
  make_policy = ppo_networks.make_inference_fn(networks)
  obs = jnp.arange(4.0)
  a1, _ = make_policy(bundle, deterministic=True)(obs, jax.random.PRNGKey(0))
  a2, _ = make_policy(restored, deterministic=True)(obs,
                                                    jax.random.PRNGKey(0))
  np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.slow
def test_ppo_humanoid_smoke():
  from brax_rodent_run_tpu.mjcf.from_mj import load_mj_path
  from brax_rodent_run_tpu import envs as env_registry
  m = load_mj_path(model_path("humanoid.xml"))
  env = env_registry.get_environment("humanoid", model=m)
  make_policy, params, metrics = ppo.train(
      environment=env,
      num_timesteps=400,
      episode_length=10,
      num_envs=4,
      num_eval_envs=4,
      learning_rate=3e-4,
      unroll_length=5,
      batch_size=4,
      num_minibatches=2,
      num_updates_per_batch=1,
      num_evals=2,
      normalize_observations=True,
      seed=0,
  )
  assert np.isfinite(metrics["eval/episode_reward"])
  leaves = jax.tree_util.tree_leaves((params[1], params[2]))
  assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_full_train_state_resume(tmp_path):
  """Straight-through training == save-at-epoch-1-then-resume training:
  identical final params and env_steps (SURVEY.md §5: the reference cannot
  resume; we must, exactly)."""
  env = PointMass()
  kwargs = dict(
      environment=env, episode_length=8, num_envs=8, num_eval_envs=8,
      learning_rate=1e-3, unroll_length=4, batch_size=8, num_minibatches=2,
      num_updates_per_batch=1, normalize_observations=True, seed=3,
      num_timesteps=4 * 8 * 2 * 4,   # 4 epochs with num_evals=5
      num_evals=5,
  )
  ck = str(tmp_path / "train_state.pkl")

  _, params_straight, _ = ppo.train(**kwargs)

  # part 1: run and checkpoint every epoch, interrupt after epoch 2 by
  # training a fresh run restored from the epoch-2 checkpoint
  saved = {}
  real_train = ppo.train

  class _Stop(Exception):
    pass

  count = {"n": 0}

  def stop_after_2(num_steps, metrics):
    count["n"] += 1
    if count["n"] >= 3:            # initial eval + 2 epochs
      raise _Stop()

  try:
    real_train(**kwargs, checkpoint_path=ck, progress_fn=stop_after_2)
  except _Stop:
    pass
  assert os.path.exists(ck)

  _, params_resumed, _ = real_train(**kwargs, restore_checkpoint_path=ck)

  for a, b in zip(jax.tree_util.tree_leaves(params_straight),
                  jax.tree_util.tree_leaves(params_resumed)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-7)
