"""On-device PPO actor-learner (single program, mesh-parallel).

Re-implements the capability the reference delegates to brax's
``ppo.train`` (brax_rodent_run_ppo.py:97-114,200; SURVEY.md §2.3): rollout
collection, GAE, and minibatched policy/value updates fused into ONE jitted
training epoch, with the same hyperparameter semantics:

  env_steps / training_step = batch_size * unroll_length * num_minibatches
  num_training_steps_per_epoch = ceil(num_timesteps /
                                      (max(num_evals-1,1) * that))

TPU-first design (SURVEY.md §7 step 5-6): instead of the reference's
pmap+NCCL device loop, the epoch body runs under ``shard_map`` over a
``jax.sharding.Mesh`` data axis — envs sharded over chips, params/optimizer
replicated, gradient ``pmean`` and normalizer ``psum`` lowering to ICI
collectives. Control returns to the host only between evals (SURVEY.md §3.1
"control crosses the device boundary only at eval epochs").

Returns ``(make_policy_fn, params, metrics)`` where params is the
``(normalizer_state, policy_params, value_params)`` triple the reference
saves/loads (brax_rodent_run_ppo.py:138,205; render_rollout.ipynb cell 3-4).
"""

from __future__ import annotations

import functools
import math as pymath
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from brax_rodent_run_tpu.envs import wrappers
from brax_rodent_run_tpu.envs.base import Env
from brax_rodent_run_tpu.training import acting, losses
from brax_rodent_run_tpu.training import networks as ppo_networks
from brax_rodent_run_tpu.training import running_statistics as rs
from brax_rodent_run_tpu.training.networks import PPONetworkParams

_AXIS = "data"


@struct.dataclass
class TrainingState:
  optimizer_state: optax.OptState
  params: PPONetworkParams
  normalizer_state: rs.RunningStatisticsState
  env_steps: jax.Array


def _strip_weak(tree):
  return jax.tree_util.tree_map(
      lambda x: jnp.asarray(x) if not isinstance(x, jnp.ndarray) else x, tree)


def train(
    environment: Env,
    num_timesteps: int,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    normalize_advantage: bool = True,
    max_grad_norm: Optional[float] = None,
    network_factory: Callable[..., ppo_networks.PPONetworks] =
    ppo_networks.make_ppo_networks,
    progress_fn: Callable[[int, Dict[str, Any]], None] = lambda *a: None,
    policy_params_fn: Callable[..., None] = lambda *a: None,
    eval_env: Optional[Env] = None,
    mesh: Optional[Mesh] = None,
    deterministic_eval: bool = False,
    restore_params: Optional[Tuple] = None,
    checkpoint_path: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
    profile_dir: Optional[str] = None,
    spmd_mode: str = "shard_map",
    epoch_scan: bool = False,
    lean_autoreset: bool = False,
):
  """Train PPO on ``environment``; see module docstring for the contract."""
  if mesh is None:
    devices = jax.devices()
    # use the largest device count that divides num_envs
    n = len(devices)
    while num_envs % n != 0:
      n -= 1
    mesh = Mesh(np.asarray(devices[:n]), (_AXIS,))
  num_devices = mesh.devices.size
  assert num_envs % num_devices == 0, (num_envs, num_devices)
  assert (batch_size * num_minibatches) % num_envs == 0
  num_unrolls = batch_size * num_minibatches // num_envs
  # one training step consumes this many environment steps:
  env_step_per_training_step = (
      batch_size * unroll_length * num_minibatches * action_repeat)
  num_evals_after_init = max(num_evals - 1, 1)
  num_training_steps_per_epoch = pymath.ceil(
      num_timesteps / (num_evals_after_init * env_step_per_training_step))

  env = wrappers.wrap_for_training(environment, episode_length=episode_length,
                                   action_repeat=action_repeat,
                                   lean_autoreset=lean_autoreset)

  obs_size = environment.observation_size
  action_size = environment.action_size

  networks = network_factory(observation_size=obs_size,
                             action_size=action_size)
  make_policy = ppo_networks.make_inference_fn(networks)

  optimizer = optax.adam(learning_rate=learning_rate)
  if max_grad_norm is not None:
    optimizer = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                            optimizer)

  loss_fn = functools.partial(
      losses.compute_ppo_loss,
      networks=networks,
      entropy_cost=entropy_cost,
      discounting=discounting,
      reward_scaling=reward_scaling,
      gae_lambda=gae_lambda,
      clipping_epsilon=clipping_epsilon,
      normalize_advantage=normalize_advantage)

  # ---------------------------------------------------------------- sgd
  def minibatch_step(carry, batch):
    data, final_obs = batch
    optimizer_state, params, normalizer_state, key = carry
    key, loss_key = jax.random.split(key)
    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, normalizer_state, data, final_obs, loss_key)
    grads = jax.lax.pmean(grads, _AXIS)
    updates, optimizer_state = optimizer.update(grads, optimizer_state,
                                                params)
    params = optax.apply_updates(params, updates)
    return (optimizer_state, params, normalizer_state, key), metrics

  def sgd_epoch(carry, _):
    optimizer_state, params, normalizer_state, data, key = carry
    key, perm_key, step_key = jax.random.split(key, 3)

    # minibatch membership via a permuted INDEX table; each minibatch
    # step gathers its slice from the single rollout buffer instead of
    # materializing a full shuffled copy. At the 2048-env config-3
    # shape the rollout obs buffer is 6.7 GB — the shuffled copy (plus
    # scan carry double-buffering) was the 29.6G-vs-15.75G HBM OOM.
    # x[permutation(key, N)] is bit-identical to permutation(key, x)
    # (verified), so training math is unchanged.
    d4, final_obs_rows = data
    lead = d4.reward.shape                     # (U, T, E)
    n_unrolls_l, e_local = lead[0], lead[2]
    n_rows = n_unrolls_l * e_local
    mb_idx = jax.random.permutation(perm_key, n_rows).reshape(
        (num_minibatches, -1))

    def gather_step(carry, idx):
      u, e = idx // e_local, idx % e_local
      # observation is stored (U, E, T*obs) — see the rollout closure;
      # everything else is (U, T, E, ...)
      obs_mb = d4.observation[u, e].reshape(
          (idx.shape[0], -1, obs_size))                # (B, T, obs)
      rest = jax.tree_util.tree_map(
          lambda x: x[u, :, e],
          d4.replace(observation=d4.reward))   # dummy; replaced below
      batch = (rest.replace(observation=obs_mb), final_obs_rows[idx])
      return minibatch_step(carry, batch)

    (optimizer_state, params, _, _), metrics = jax.lax.scan(
        gather_step, (optimizer_state, params, normalizer_state, step_key),
        mb_idx, length=num_minibatches)
    return (optimizer_state, params, normalizer_state, data, key), metrics

  # ------------------------------------------------------- training step
  def training_step(carry, _):
    ts, env_state, key = carry
    key, unroll_key, sgd_key, new_key = jax.random.split(key, 4)

    policy = make_policy((ts.normalizer_state, ts.params.policy,
                          ts.params.value))

    def rollout(carry, _):
      state, k = carry
      k, uk = jax.random.split(k)
      nstate, data = acting.generate_unroll(
          env, state, policy, uk, unroll_length,
          extra_fields=("truncation",))
      # store observations as (E, T*obs) per unroll: in the scan-stacked
      # (U, T, E, obs) layout the TPU (8,128) tile pads T=10 sublanes to
      # 16 — a 1.6x expansion of the 6.2G obs buffer — and every layout
      # XLA picked for a 4-D store materialized a 10G transpose copy
      # (OOM dumps). The 3-D (U, E, T*obs) form is natural row-major:
      # ~zero padding, and both the minibatch gather and the normalizer
      # view are contiguous reshapes.
      o = data.observation                          # (T, E, obs)
      data = data.replace(
          observation=jnp.swapaxes(o, 0, 1).reshape(o.shape[1], -1))
      # nstate.obs IS the successor observation of the unroll's last
      # step (identical to what a per-step next_observation would have
      # recorded there, including the auto-reset quirk on done)
      return (nstate, k), (data, nstate.obs)

    (env_state, _), (data, final_obs) = jax.lax.scan(
        rollout, (env_state, unroll_key), (), length=num_unrolls)
    # data leaves stay in the scan-native (num_unrolls, T, E_local, ...)
    # layout: the old swapaxes+reshape materialized a full transposed
    # copy of the 6.7 GB rollout buffer (the last 1.26G of the config-3
    # HBM OOM). Minibatch gathers index (u, e) pairs directly; logical
    # row r = u*E_local + e matches the old reshape ordering bit-exactly.
    final_obs = final_obs.reshape((-1,) + final_obs.shape[2:])

    if normalize_observations:
      # obs is (U, E, T*obs): the (U, E, T, obs) view is a contiguous
      # reshape; rs.update reduces over the three leading axes
      ob = data.observation
      obs4 = ob.reshape(ob.shape[0], ob.shape[1], unroll_length, obs_size)
      normalizer_state = rs.update(ts.normalizer_state, obs4,
                                   pmap_axis_name=_AXIS)
    else:
      # identity normalizer: state stays at init (mean 0, std 1), so
      # rs.normalize is a no-op everywhere it is applied (reference
      # semantics: normalize_observations is a real choice,
      # brax_rodent_run_ppo.py:103)
      normalizer_state = ts.normalizer_state

    (optimizer_state, params, _, _, _), sgd_metrics = jax.lax.scan(
        sgd_epoch,
        (ts.optimizer_state, ts.params, normalizer_state,
         (data, final_obs), sgd_key),
        (), length=num_updates_per_batch)

    dbg = {}
    if os.environ.get("BRR_PPO_DEBUG_NAN"):
      # rollout-health counters (trace-time flag; BRR_PPO_DEBUG_NAN=1):
      # split physics/obs NaNs from learner NaNs without leaving jit
      dbg = {
          "debug/nan_obs": jnp.sum(
              ~jnp.isfinite(data.observation)).astype(jnp.float32),
          "debug/nan_reward": jnp.sum(
              ~jnp.isfinite(data.reward)).astype(jnp.float32),
          "debug/max_abs_obs": jnp.max(jnp.abs(data.observation)),
          "debug/max_abs_reward": jnp.max(jnp.abs(data.reward)),
          "debug/nan_policy_params": sum(
              jnp.sum(~jnp.isfinite(x)).astype(jnp.float32)
              for x in jax.tree_util.tree_leaves(params.policy)),
      }

    new_ts = TrainingState(
        optimizer_state=optimizer_state, params=params,
        normalizer_state=normalizer_state,
        env_steps=ts.env_steps + env_step_per_training_step)
    metrics = jax.tree_util.tree_map(jnp.mean, sgd_metrics)
    metrics = {**metrics, **dbg}
    return (new_ts, env_state, new_key), metrics

  # ------------------------------------------------------ training epoch
  # ONE training step per XLA execution, host loop over the epoch's
  # steps. A device-side lax.scan over training steps compiles to a
  # single multi-second execution; on single-chip tunnel deployments
  # (axon) executions that long crash the TPU worker, and the host loop
  # costs only ~ms of dispatch per ~1.3 s step. Math is identical: the
  # scan carried (ts, env_state, key) exactly as the loop does.
  def _step_body(ts: TrainingState, env_state, key: jax.Array):
    """Per-shard body: identical math under shard_map (production) and
    vmap-with-axis-name (the semantic reference used by the parity test)."""
    key = jax.random.fold_in(key, jax.lax.axis_index(_AXIS))
    (ts, env_state, _), metrics = training_step((ts, env_state, key), None)
    metrics = jax.lax.pmean(jax.tree_util.tree_map(jnp.mean, metrics), _AXIS)
    return ts, env_state, metrics

  if spmd_mode == "shard_map":
    one_training_step = functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(_AXIS), P()),
        out_specs=(P(), P(_AXIS), P()),
        check_vma=False)(_step_body)
  else:
    # "vmap": emulate the num_devices-shard SPMD program on however many
    # real devices exist by vmapping the same body over a leading shard
    # axis; psum/pmean resolve over the vmapped axis name. Bit-compatible
    # with the shard_map program — the distributed-parity test relies on
    # exactly this equivalence.
    assert spmd_mode == "vmap", spmd_mode

    def one_training_step(ts, env_state, key):
      shards = jax.tree_util.tree_map(
          lambda x: x.reshape((num_devices, -1) + x.shape[1:]), env_state)
      ts_o, es_o, metrics = jax.vmap(
          _step_body, in_axes=(None, 0, None), out_axes=0,
          axis_name=_AXIS)(ts, shards, key)
      take0 = lambda x: jax.tree_util.tree_map(lambda l: l[0], x)
      es_o = jax.tree_util.tree_map(
          lambda x: x.reshape((-1,) + x.shape[2:]), es_o)
      return take0(ts_o), es_o, take0(metrics)

  one_training_step = jax.jit(one_training_step, donate_argnums=(1,))

  if epoch_scan:
    # whole epoch as ONE device-side scan over training steps (identical
    # math: the scan carries (ts, env_state) exactly as the host loop
    # does, with the same fold_in(key, i) schedule). Default off: on
    # single-chip tunnel deployments multi-second executions crash the
    # TPU worker (commit 6599fa5); enable off-tunnel to shave the ~ms
    # of per-step host dispatch.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def _epoch_scan(ts, env_state, key):
      def body(carry, i):
        ts, env_state = carry
        ts, env_state, metrics = one_training_step(
            ts, env_state, jax.random.fold_in(key, i))
        return (ts, env_state), metrics
      (ts, env_state), ms = jax.lax.scan(
          body, (ts, env_state),
          jnp.arange(num_training_steps_per_epoch))
      return ts, env_state, jax.tree_util.tree_map(
          lambda x: jnp.mean(x, axis=0), ms)

    def training_epoch(ts: TrainingState, env_state, key: jax.Array):
      return _epoch_scan(ts, env_state, key)
  else:
    def training_epoch(ts: TrainingState, env_state, key: jax.Array):
      ms = []
      for i in range(num_training_steps_per_epoch):
        ts, env_state, metrics = one_training_step(
            ts, env_state, jax.random.fold_in(key, i))
        ms.append(metrics)
      # average on the HOST with numpy: the metric scalars are consumed
      # host-side anyway, and dispatching a jnp.stack per epoch hit a
      # flaky XLA:CPU runtime abort on this machine (r5: 'Fatal Python
      # error: Aborted' in apply_primitive, intermittently killing the
      # test suite at the same spot)
      return ts, env_state, jax.tree_util.tree_map(
          lambda *xs: float(np.mean([np.asarray(x) for x in xs])), *ms)

  # ---------------------------------------------------------------- init
  key = jax.random.PRNGKey(seed)
  key, net_key, env_key, eval_key, epoch_key = jax.random.split(key, 5)

  init_params = networks.init(net_key)
  ts = TrainingState(
      optimizer_state=optimizer.init(init_params),
      params=init_params,
      normalizer_state=rs.init_state(jnp.zeros(obs_size)),
      env_steps=jnp.zeros((), jnp.int64 if
                          jax.config.jax_enable_x64 else jnp.int32))
  if restore_params is not None:
    ts = ts.replace(
        normalizer_state=restore_params[0],
        params=PPONetworkParams(policy=restore_params[1],
                                value=restore_params[2]))
  ts = _strip_weak(ts)

  env_sharding = NamedSharding(mesh, P(_AXIS))
  # Multi-host-correct reset: every process derives the SAME global key
  # array deterministically, then contributes only its host-local shard —
  # the assembled global jax.Array is sharded over the mesh's data axis
  # (a plain global-sized array here would be wrong with num_processes>1).
  from brax_rodent_run_tpu.parallel import mesh as mesh_mod
  all_keys = np.asarray(jax.device_get(jax.random.split(env_key, num_envs)))
  local_sl = mesh_mod.local_batch_slice(mesh, num_envs)
  reset_keys = mesh_mod.host_local_array(
      mesh, (num_envs,) + all_keys.shape[1:], all_keys[local_sl])
  env_state = jax.jit(env.reset, in_shardings=env_sharding,
                      out_shardings=env_sharding)(reset_keys)

  # ---- full train-state resume (params + optimizer + normalizer + env
  # state + rng + step — the gap SURVEY.md §5 "Checkpoint / resume" flags:
  # the reference saves eval params but cannot resume)
  start_epoch = 0
  if restore_checkpoint_path:
    from brax_rodent_run_tpu.io import checkpoint as _ckpt
    blob = _ckpt.load_params(restore_checkpoint_path)
    ts = _strip_weak(blob["training_state"])
    saved_env_state = blob.get("env_state")
    if saved_env_state is not None:
      saved_envs = jax.tree_util.tree_leaves(saved_env_state)[0].shape[0]
      if saved_envs == num_envs:
        env_state = jax.device_put(saved_env_state, env_sharding)
      else:
        print(f"[ppo] checkpoint has {saved_envs} envs, run has "
              f"{num_envs}; envs re-reset")
    epoch_key = jnp.asarray(blob.get("epoch_key", epoch_key))
    start_epoch = int(blob.get("epoch", 0))

  def save_checkpoint(epoch, ts, env_state):
    if not checkpoint_path or jax.process_index() != 0:
      return
    from brax_rodent_run_tpu.io import checkpoint as _ckpt
    _ckpt.save_params(checkpoint_path, {
        "training_state": jax.device_get(ts),
        "env_state": jax.device_get(env_state),
        "epoch_key": jax.device_get(epoch_key),
        "epoch": epoch + 1,
    })

  evaluator = acting.Evaluator(
      wrappers.EpisodeWrapper(eval_env or environment, episode_length,
                              action_repeat),
      functools.partial(make_policy, deterministic=deterministic_eval),
      num_eval_envs=num_eval_envs, episode_length=episode_length,
      action_repeat=action_repeat, key=eval_key)

  def params_tuple(ts):
    return (ts.normalizer_state, ts.params.policy, ts.params.value)

  all_metrics = {}
  current_step = 0

  # eval before any training (num_evals >= 2 semantics)
  if num_evals > 1:
    all_metrics = evaluator.run_evaluation(params_tuple(ts))
    progress_fn(0, all_metrics)

  for epoch in range(start_epoch, num_evals_after_init):
    t0 = time.perf_counter()
    if profile_dir and epoch == start_epoch + 1:
      jax.profiler.start_trace(profile_dir)
    key_for_epoch = jax.random.fold_in(epoch_key, epoch)
    ts, env_state, train_metrics = training_epoch(ts, env_state,
                                                  key_for_epoch)
    train_metrics = jax.device_get(train_metrics)
    if profile_dir and epoch == start_epoch + 1:
      jax.profiler.stop_trace()
    epoch_dt = time.perf_counter() - t0
    current_step = int(jax.device_get(ts.env_steps))
    save_checkpoint(epoch, ts, env_state)

    sps = (num_training_steps_per_epoch * env_step_per_training_step
           / epoch_dt)
    metrics = {
        "training/sps": sps,
        "training/walltime": epoch_dt,
        **{f"training/{k}": float(np.mean(v))
           for k, v in train_metrics.items()},
    }
    metrics.update(evaluator.run_evaluation(params_tuple(ts)))
    all_metrics = metrics
    progress_fn(current_step, metrics)
    policy_params_fn(current_step, make_policy, params_tuple(ts))

  return make_policy, params_tuple(ts), all_metrics
