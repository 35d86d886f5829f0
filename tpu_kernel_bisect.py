"""Section-level on-chip kernel bisect.

The whole-control-step kernel returns its 26 intermediate products
(FK/CoM -> actuation -> smooth dynamics -> constraint solve ->
integration). Running ONE substep on the real rodent and diffing every
output against the XLA stage composition (same backend, same states)
localizes an on-chip miscompile to the first section whose outputs
diverge — far tighter than the scalar kernel_vs_stage_err.

Usage: python tpu_kernel_bisect.py [--model rodent_new.xml] [--envs 128]
       [--n-frames 1] [--distinct 8]
Flags in the environment (BRR_CG_UNROLL/BRR_LS_SEQ/...) apply as usual,
so drive it from tpu_kernel_ab-style combo loops to bisect flags AND
sections at once.
"""

import argparse
import json
import os

import numpy as np

_NAMES = ("subtree_com", "cinert", "cdof", "cvel", "cdof_dot",
          "qfrc_bias", "qfrc_spring", "qfrc_damper", "qfrc_passive",
          "actuator_length", "actuator_velocity", "actuator_force",
          "act_dot", "qfrc_actuator", "qfrc_smooth", "qacc_smooth",
          "qacc", "qfrc_constraint", "efc_force",
          "qpos_new", "qvel_new", "act_new",
          "qpos_pre", "con_dist", "con_pos", "con_frame")


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--envs", type=int, default=128)
  ap.add_argument("--n-frames", type=int, default=1)
  ap.add_argument("--distinct", type=int, default=8)
  ap.add_argument("--qpos-noise", type=float, default=0.01)
  ap.add_argument("--qvel-scale", type=float, default=0.1)
  ap.add_argument("--ctrl-scale", type=float, default=0.5)
  ap.add_argument("--nan-hunt", action="store_true",
                  help="report per-output NaN counts instead of errors")
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.utils.cache import configure_cache
  configure_cache(os.path.dirname(os.path.abspath(__file__)))

  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = load_model(_model_path(args.model), solver="cg", iterations=8,
                 ls_iterations=8)
  assert ff.eligible_steps(m)

  rng = np.random.RandomState(3)
  K = args.distinct
  qpos0 = np.asarray(m.qpos0, np.float32)
  states = []
  for _ in range(K):
    qp = qpos0 + rng.uniform(-args.qpos_noise, args.qpos_noise,
                             qpos0.shape).astype(np.float32)
    qv = rng.uniform(-args.qvel_scale, args.qvel_scale,
                     (m.nv,)).astype(np.float32)
    u = rng.uniform(-args.ctrl_scale, args.ctrl_scale,
                    (m.nu,)).astype(np.float32)
    d = make_data(m, dtype=jnp.float32)
    d = d.replace(qpos=jnp.asarray(qp), qvel=jnp.asarray(qv),
                  ctrl=jnp.asarray(u))
    states.append(forward.fwd_position(m, d))

  idx = np.arange(args.envs) % K
  db = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs)[idx], *states)

  bargs = (db.qpos, db.qvel, db.act, db.ctrl, db.qfrc_applied)
  out = jax.jit(
      lambda *a: ff.fused_steps_batched(m, args.n_frames, *a))(*bargs)
  out = [np.asarray(o, np.float64) for o in out]

  if args.nan_hunt:
    report = {}
    for i, name in enumerate(_NAMES[:len(out)]):
      n_nan = int(np.sum(~np.isfinite(out[i])))
      if n_nan:
        report[name] = n_nan
    report["_total_outputs"] = len(out)
    report["backend"] = jax.default_backend()
    report["scales"] = [args.qpos_noise, args.qvel_scale, args.ctrl_scale]
    report["n_frames"] = args.n_frames
    print(json.dumps(report))
    return 0

  dbg = os.environ.get("BRR_FF_DBG", "")
  if dbg:
    # the kernel's qacc_smooth slot carries jnp.sum(qm or qminv, axis=1)
    # (fused_full BRR_FF_DBG hook); compare against the stage pipeline's
    # qM per distinct state
    from brax_rodent_run_tpu.physics import smooth
    errs = []
    crb_hp = jax.jit(lambda s: smooth.crb(m, s, factor=False))
    for k in range(K):
      s = states[k]
      # reference at HIGHEST matmul precision: the fingerprint measures
      # the kernel's own deviation from exact f32, not the bf16-pass
      # noise both sides would share at default precision
      with jax.default_matmul_precision("highest"):
        dk = crb_hp(s)
      qM = np.asarray(dk.qM, np.float64)
      if dbg in ("dbgqminv", "dbgmv"):
        refv = np.linalg.inv(qM).sum(axis=1)
      else:
        refv = qM.sum(axis=1)
      got = out[15][idx == k][:, :len(refv)]
      errs.append(float(np.max(np.abs(got - refv[None]))))
    print(json.dumps({"dbg": dbg, "per_state_err": errs,
                      "backend": jax.default_backend()}))
    return 0

  core = jax.jit(lambda *a: ff._core_steps(m, args.n_frames, *a))
  refs = []
  for k in range(K):
    s = states[k]
    refs.append([np.asarray(o, np.float64) for o in core(
        s.qpos, s.qvel, s.act, s.ctrl, s.qfrc_applied)])

  report = {}
  for i, name in enumerate(_NAMES[:len(out)]):
    err = 0.0
    for k in range(K):
      a = out[i][idx == k]
      b = refs[k][i][None]
      if name == "con_dist":
        a, b = np.minimum(a, 1e3), np.minimum(b, 1e3)
      err = max(err, float(np.max(np.abs(a - b))))
    report[name] = round(err, 8)
  report["backend"] = jax.default_backend()
  report["flags"] = {k: v for k, v in os.environ.items()
                     if k.startswith("BRR_")}
  print(json.dumps(report))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
