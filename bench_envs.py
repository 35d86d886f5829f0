"""Batched-environment throughput benchmark (reference torch_bench.py
equivalent, TPU-native).

The reference times 1000-step rollouts of SerialEnv / ParallelEnv /
envpool MultiThreadedEnv at 1/4/16 workers (torch_bench.py:34,80-124).
On TPU there are no env workers — batching is vmap inside one jitted
program — so the sweep axis is num_envs, and we report env-steps/s for
(a) the raw wrapped env step and (b) the step inside a lax.scan rollout
(the shape the trainer actually compiles). Results go to stdout and a
CSV (torch_bench.py:124 writes multithreaded_benchmark.csv).

Usage:
  python bench_envs.py [--envs 1,4,16,256,2048] [--steps 200]
      [--model rodent_new.xml] [--env rodent|humanoid] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_MODELS = os.path.join(_HERE, "assets")


def model_path(name: str) -> str:
  return os.path.join(_MODELS, name)


def build_env(args):
  import jax.numpy as jnp
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu import envs

  m = load_model(model_path(args.model), solver="cg", iterations=8,
                   ls_iterations=8)
  kwargs = {}
  if args.env == "rodent":
    track = jnp.asarray(np.cumsum(
        np.tile([[0.002, 0.0, 0.0]], (300, 1)), axis=0), jnp.float32)
    kwargs["track_pos"] = track
  return envs.get_environment(args.env, model=m, n_frames=args.n_frames,
                              **kwargs)


def bench_one(env, num_envs: int, steps: int, scan: bool):
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.envs.wrappers import wrap_for_training

  wrapped = wrap_for_training(env, episode_length=150)
  rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
  state = jax.jit(wrapped.reset)(rng)
  act = jnp.zeros((num_envs, env.action_size), jnp.float32)

  def sync(s):
    # host read of a computed output: the only trustworthy barrier under
    # the axon tunnel (block_until_ready returns before execution ends).
    return float(jnp.sum(s.reward))

  if scan:
    def run(state, act):
      def f(s, _):
        s = wrapped.step(s, act)
        return s, ()
      s, _ = jax.lax.scan(f, state, (), length=steps)
      return s
    run = jax.jit(run)
    sync(run(state, act))                               # compile
    t0 = time.perf_counter()
    sync(run(state, act))
    dt = time.perf_counter() - t0
  else:
    step = jax.jit(wrapped.step)
    sync(step(state, act))                              # compile
    t0 = time.perf_counter()
    s = state
    for _ in range(steps):
      s = step(s, act)
    sync(s)
    dt = time.perf_counter() - t0
  return num_envs * steps / dt


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--envs", default="1,4,16,256,2048")
  ap.add_argument("--steps", type=int, default=200)
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--env", default="rodent",
                  choices=["rodent", "humanoid"])
  ap.add_argument("--n-frames", type=int, default=10)
  ap.add_argument("--csv", default="env_benchmark.csv")
  args = ap.parse_args(argv)

  import jax
  env = build_env(args)
  rows = []
  for n in [int(x) for x in args.envs.split(",") if x]:
    for scan in (False, True):
      sps = bench_one(env, n, args.steps, scan)
      mode = "scan" if scan else "eager"
      rows.append({"num_envs": n, "mode": mode, "steps": args.steps,
                   "env_steps_per_s": round(sps, 1),
                   "backend": jax.default_backend()})
      print(f"num_envs={n:5d} mode={mode:5s} "
            f"env-steps/s={sps:12.1f}", flush=True)

  with open(args.csv, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0]))
    w.writeheader()
    w.writerows(rows)
  print(f"wrote {args.csv}")


if __name__ == "__main__":
  main()
