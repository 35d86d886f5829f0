"""Per-stage timing of the rodent physics substep on the current backend.

Times each pipeline stage jitted+vmapped over the env batch in isolation
(SURVEY.md §7 step 7: profile before writing Pallas kernels).

Through the axon tunnel, per-call host syncs cost ~30 ms regardless of
device time, so each stage is run in a device-side ``lax.fori_loop``
with a data-dependency chain and synced ONCE via a host read of the
result; the single sync's fixed latency is measured with an empty loop
and subtracted.
"""

import argparse
import time

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--num-envs", type=int, default=2048)
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--iters", type=int, default=20)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.physics import collision, constraint, forward, smooth
  from brax_rodent_run_tpu.physics import sensor as sensor_mod
  from brax_rodent_run_tpu.physics import solver as solver_mod
  from brax_rodent_run_tpu.physics.types import make_data

  m = load_model(_model_path(args.model), solver="cg", iterations=8,
                 ls_iterations=8)
  N = args.num_envs
  iters = args.iters

  d0 = make_data(m)
  rng = jax.random.PRNGKey(0)
  qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32), (N, 1))
  qpos += jax.random.uniform(rng, (N, m.nq), jnp.float32, -0.01, 0.01)
  qvel = jax.random.uniform(rng, (N, m.nv), jnp.float32, -0.1, 0.1)
  batch = jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)
  ctrl = jnp.zeros((N, m.nu), jnp.float32)

  # run the full position+velocity pipeline once so every stage sees
  # realistic inputs
  full = jax.jit(jax.vmap(lambda d, u: forward.forward(m, d.replace(ctrl=u))))
  batch = full(batch, ctrl)
  _ = float(jnp.sum(batch.qacc))

  stages = [
      ("kinematics", smooth.kinematics),
      ("com_pos", smooth.com_pos),
      ("tendon", smooth.tendon),
      ("crb+factor", smooth.crb),
      ("collision", collision.collision),
      ("transmission", smooth.transmission),
      ("make_constraint", constraint.make_constraint),
      ("com_vel", smooth.com_vel),
      ("rne", smooth.rne),
      ("passive", smooth.passive),
      ("sensor_vel", sensor_mod.sensor_vel),
      ("fwd_actuation", smooth.fwd_actuation),
      ("fwd_acceleration", smooth.fwd_acceleration),
      ("solve", solver_mod.solve),
      ("sensor_acc", sensor_mod.sensor_acc),
      ("euler", forward.euler),
      ("FULL substep", lambda mm, dd: forward.step(mm, dd)),
      ("FULL substep nosens", lambda mm, dd: forward.step(mm, dd,
                                                          sensors=False)),
  ]

  from brax_rodent_run_tpu.ops import fused as fused_mod
  if fused_mod.eligible(m):
    def fused_region(mm, dd):
      qfs = (dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_actuator
             + dd.qfrc_applied)
      out = fused_mod.fused_entry(mm)(
          dd.qpos, dd.qvel, dd.cinert, dd.cdof, qfs,
          dd.contact.dist, dd.contact.pos, dd.contact.frame,
          dd.subtree_com)
      return dd.replace(qacc=out[0], qacc_smooth=out[1],
                        qfrc_constraint=out[2], efc_force=out[3],
                        qvel=out[4])
    stages.insert(-2, ("fused_kernel", fused_region))

  def timed_loop(fn):
    """iters× fn on device with a dependency chain; one host sync."""
    def run(d):
      def body(i, d):
        out = jax.vmap(lambda dd: fn(m, dd))(d)
        # chain: fold a reduction of EVERY output leaf into EVERY input
        # leaf, so the stage can be neither dead-code-eliminated (all
        # outputs are read) nor hoisted out of the loop (all inputs
        # change each trip). 1e-38*h is numerically a no-op on normal
        # f32 values but not symbolically foldable.
        h = 0.0
        for leaf in jax.tree_util.tree_leaves(out):
          h = h + jnp.sum(leaf).astype(jnp.float32)
        return jax.tree_util.tree_map(
            lambda l: l + (1e-38 * h).astype(l.dtype)
            if jnp.issubdtype(l.dtype, jnp.floating) else l, d)
      d = jax.lax.fori_loop(0, iters, body, d)
      return jnp.sum(d.qvel)
    f = jax.jit(run)
    _ = float(f(batch))                      # compile + warmup
    t0 = time.perf_counter()
    _ = float(f(batch))                      # single honest sync
    return (time.perf_counter() - t0)

  # fixed cost of dispatch + sync, measured with a no-op loop
  overhead = timed_loop(lambda mm, dd: dd)
  print(f"backend={jax.default_backend()} envs={N} nv={m.nv} "
        f"nefc={m.nefc_max} ncon={m.ncon_max} iters={iters} "
        f"(sync overhead {overhead*1e3:.1f} ms, subtracted)")

  total = 0.0
  for name, fn in stages:
    dt = max(timed_loop(fn) - overhead, 0.0) / iters
    if not (name.startswith("FULL") or name == "fused_kernel"):
      total += dt
    print(f"{name:18s} {dt*1e3:9.2f} ms  "
          f"({N/max(dt, 1e-12):12.0f} env-substeps/s)", flush=True)
  print(f"{'sum of stages':18s} {total*1e3:9.2f} ms")


if __name__ == "__main__":
  main()
