"""Time the full-dynamics kernel region alone under section ablations
(BRR_FF_ABLATE) to locate where kernel time goes. PROFILING ONLY."""
import argparse
import os
import time

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--num-envs", type=int, default=2048)
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--iters", type=int, default=30)
  ap.add_argument("--ablate", default="", help="comma tokens: chol,cg,ls,damp")
  args = ap.parse_args()
  os.environ["BRR_FF_ABLATE"] = args.ablate

  import jax
  import jax.numpy as jnp
  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = load_model(_model_path(args.model), solver="cg", iterations=8,
                 ls_iterations=8)
  assert ff.eligible_full(m)
  N = args.num_envs

  d0 = make_data(m)
  rng = jax.random.PRNGKey(0)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (N, 1))
  qpos += jax.random.uniform(rng, (N, m.nq), jnp.float32, -0.01, 0.01)
  qvel = jax.random.uniform(rng, (N, m.nv), jnp.float32, -0.1, 0.1)
  batch = jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)
  batch = jax.jit(jax.vmap(lambda d: forward.fwd_position(m, d)))(batch)

  inputs = (batch.qpos, batch.qvel, batch.act, batch.ctrl,
            batch.qfrc_applied, batch.xpos, batch.xmat, batch.xipos,
            batch.ximat, batch.xanchor, batch.xaxis,
            batch.contact.dist, batch.contact.pos, batch.contact.frame)

  def run(inp):
    def body(i, inp):
      out = ff.fused_full_batched(m, *inp)
      h = sum(jnp.sum(o).astype(jnp.float32) for o in out)
      return tuple(x + (1e-38 * h).astype(x.dtype) for x in inp)
    inp = jax.lax.fori_loop(0, args.iters, body, inp)
    return jnp.sum(inp[0])

  f = jax.jit(run)
  _ = float(f(inputs))
  t0 = time.perf_counter()
  _ = float(f(inputs))
  dt = time.perf_counter() - t0

  def run0(inp):
    return jnp.sum(inp[0]) * 1.0
  f0 = jax.jit(run0)
  _ = float(f0(inputs))
  t0 = time.perf_counter()
  _ = float(f0(inputs))
  overhead = time.perf_counter() - t0

  per = (dt - overhead) / args.iters
  print(f"ablate='{args.ablate}' kernel region: {per*1e3:.2f} ms "
        f"({N/per:,.0f} env-substeps/s)")


if __name__ == "__main__":
  main()
