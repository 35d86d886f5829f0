"""Worker for tests/test_multiprocess.py: one of N real processes in a
``jax.distributed`` rig over the CPU backend.

Exercises the trainer's ACTUAL multi-host feed path (VERDICT.md r1 #4):
`local_batch_slice` + `host_local_array` assemble the global reset-key
array from per-process shards, the epoch runs under shard_map over the
global mesh, and every process must end with bit-identical replicated
params (grad pmean + normalizer psum ride the distributed collectives).

Usage: multiprocess_worker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import pickle
import sys


def main():
  pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
  os.environ["JAX_PLATFORMS"] = "cpu"
  os.environ.setdefault(
      "XLA_FLAGS", "--xla_force_host_platform_device_count=2")

  import jax
  # the axon sitecustomize force-registers the TPU tunnel backend even
  # with JAX_PLATFORMS=cpu in the env; force cpu before any device query
  # (two processes grabbing the single tunnel chip deadlocks)
  jax.config.update("jax_platforms", "cpu")

  from brax_rodent_run_tpu.parallel import mesh as mesh_mod
  mesh_mod.initialize_distributed(coordinator=f"localhost:{port}",
                                  num_processes=nproc, process_id=pid)
  assert jax.process_count() == nproc, jax.process_count()

  import jax.numpy as jnp
  import numpy as np
  from flax import struct

  from brax_rodent_run_tpu.envs.base import Env, State
  from brax_rodent_run_tpu.training import ppo

  @struct.dataclass
  class _ToyData:
    pos: jax.Array

  class PointMass(Env):
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
      pos = (state.pipeline_state.pos
             + 0.1 * jnp.tanh(action)).astype(jnp.float32)
      reward = -jnp.linalg.norm(pos).astype(jnp.float32)
      return state.replace(
          pipeline_state=_ToyData(pos=pos), obs=pos, reward=reward,
          metrics={"dist": jnp.linalg.norm(pos).astype(jnp.float32)})

  mesh = mesh_mod.make_mesh()          # all GLOBAL devices
  assert mesh.devices.size == nproc * jax.local_device_count()

  _, params, metrics = ppo.train(
      environment=PointMass(),
      num_timesteps=256,
      episode_length=8,
      num_envs=8,
      num_eval_envs=8,
      learning_rate=3e-4,
      unroll_length=4,
      batch_size=8,
      num_minibatches=4,
      num_updates_per_batch=1,
      num_evals=1,
      normalize_observations=True,     # exercises the psum normalizer
      seed=7,
      mesh=mesh,
  )
  for v in jax.tree_util.tree_leaves(metrics):
    assert np.all(np.isfinite(np.asarray(v))), metrics

  with open(os.path.join(outdir, f"params_{pid}.pkl"), "wb") as f:
    pickle.dump(jax.device_get(params), f)
  print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
  main()
