"""Decompose the per-CONTROL-step cost at bench shape (2048 envs).

Times, each as a device-side scan with ONE trustworthy host sync
(see profile_stages.py for the tunnel-latency rationale):
  raw   — raw fused kernel call    (ops/fused_full.fused_steps_entry)
  pipe  — pipeline_steps_fused     (+ XLA kinematics + sensors)
  bare  — bare Rodent env.step     (+ obs/reward assembly)
  wrap  — wrapped env.step         (+ Episode/Vmap/AutoReset bookkeeping)
  bench — wrapped step + action RNG (the bench loop body)

The deltas between consecutive rows localize the residual non-kernel
work the v3 kernel left behind (VERDICT.md r1 missing #1). Sections are
lazy (no env.reset compile unless bare/wrap/bench is requested) and the
repo's persistent compile cache is on, so repeated runs skip compiles.
"""

import argparse
import os
import time

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--num-envs", type=int, default=2048)
  ap.add_argument("--iters", type=int, default=20)
  ap.add_argument("--only", default="",
                  help="comma list of raw,pipe,bare,wrap,bench")
  args = ap.parse_args()

  import jax
  from brax_rodent_run_tpu.utils.cache import configure_cache
  configure_cache(os.path.dirname(os.path.abspath(__file__)))

  import jax.numpy as jnp
  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.envs.rodent import Rodent
  from brax_rodent_run_tpu.envs.wrappers import wrap_for_training
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward as fwd
  from brax_rodent_run_tpu.physics.types import make_data

  N = args.num_envs
  iters = args.iters
  m = load_model(_model_path("rodent_new.xml"), solver="cg",
                 iterations=8, ls_iterations=8)
  track = jnp.asarray(
      np.cumsum(np.tile(np.array([[0.002, 0.0, 0.0]]), (260, 1)), axis=0),
      jnp.float32)
  env = Rodent(m, track_pos=track)

  def synth_state():
    """Batched near-qpos0 state without compiling env.reset."""
    d0 = make_data(m)
    rng = jax.random.PRNGKey(0)
    qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (N, 1))
    qpos += jax.random.uniform(rng, (N, m.nq), jnp.float32, -0.01, 0.01)
    qvel = jax.random.uniform(rng, (N, m.nv), jnp.float32, -0.1, 0.1)
    return jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)

  def timed(name, mk):
    """mk() -> (f, carry); times iters x f on device, one host sync."""
    def run(carry):
      def body(c, _):
        return f(c), ()
      c, _ = jax.lax.scan(body, carry, (), length=iters)
      return jax.tree_util.tree_reduce(
          lambda a, l: a + jnp.sum(l).astype(jnp.float32)
          if jnp.issubdtype(l.dtype, jnp.floating) else a,
          c, jnp.float32(0.0))
    f, carry = mk()
    g = jax.jit(run)
    _ = float(g(carry))
    t0 = time.perf_counter()
    _ = float(g(carry))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.2f} ms/ctrl-step "
          f"({N/max(dt,1e-12):12.0f} env-steps/s)", flush=True)
    return dt

  def mk_raw():
    entry = ff.fused_steps_entry(m, env._n_frames)
    data0 = synth_state()
    def f(c):
      qpos, qvel, act = c
      out = jax.vmap(entry)(qpos, qvel, act,
                            jnp.zeros((N, m.nu), jnp.float32),
                            jnp.zeros((N, m.nv), jnp.float32))
      return out[19], out[20], out[21]   # qpos_new, qvel_new, act_new
    return f, (data0.qpos, data0.qvel, data0.act)

  def mk_pipe():
    data0 = synth_state()
    def f(d):
      return fwd.pipeline_steps_fused(
          m, d.replace(ctrl=jnp.zeros((m.nu,), jnp.float32)),
          env._n_frames)
    return jax.vmap(f), data0

  lean_env = Rodent(m, track_pos=track, lean_pipeline=True)

  def mk_bare():
    rng = jax.random.split(jax.random.PRNGKey(0), N)
    bstate = jax.jit(jax.vmap(env.reset))(rng)
    act = jnp.zeros((N, env.action_size), jnp.float32)
    return (lambda s: jax.vmap(env.step)(s, act)), bstate

  def _wrapped(e, lean_reset):
    wenv = wrap_for_training(e, episode_length=150,
                             lean_autoreset=lean_reset)
    rng = jax.random.split(jax.random.PRNGKey(0), N)
    return wenv, jax.jit(wenv.reset)(rng)

  def mk_wrap():
    wenv, wstate = _wrapped(env, False)
    act = jnp.zeros((N, env.action_size), jnp.float32)
    return (lambda s: wenv.step(s, act)), wstate

  def _bench_body(e, lean_reset):
    wenv, wstate = _wrapped(e, lean_reset)
    def f(c):
      s, key = c
      key, akey = jax.random.split(key)
      a = jax.random.uniform(akey, (N, env.action_size), jnp.float32,
                             -0.3, 0.3)
      return wenv.step(s, a), key
    return f, (wstate, jax.random.PRNGKey(1))

  def mk_bench():
    return _bench_body(env, False)

  def mk_lean():
    return _bench_body(lean_env, True)

  print(f"backend={jax.default_backend()} envs={N} iters={iters}",
        flush=True)
  sections = [("raw", "raw fused kernel", mk_raw),
              ("pipe", "pipeline_steps_fused", mk_pipe),
              ("bare", "bare env.step", mk_bare),
              ("wrap", "wrapped env.step", mk_wrap),
              ("bench", "bench body (step+rng)", mk_bench),
              ("lean", "lean bench body", mk_lean)]
  only = set(filter(None, args.only.split(",")))
  ts = {}
  for key, name, mk in sections:
    if only and key not in only:
      continue
    ts[key] = timed(name, mk)
  pairs = [("kinematics+sensors", "pipe", "raw"),
           ("obs/reward", "bare", "pipe"),
           ("wrappers", "wrap", "bare"),
           ("action rng", "bench", "wrap"),
           ("lean total win", "bench", "lean")]
  deltas = [f"{name} {1e3*(ts[a]-ts[b]):6.2f} ms"
            for name, a, b in pairs if a in ts and b in ts]
  if deltas:
    print("\ndeltas: " + " | ".join(deltas))


if __name__ == "__main__":
  main()
