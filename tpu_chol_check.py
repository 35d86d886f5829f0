"""On-chip micro-check of the standalone blocked Cholesky/inverse kernel.

The r5 n1-substep bisect localized the mega-kernel's on-chip divergence
to the explicit M^-1 section (qfrc_smooth ok at 1.3e-3, qacc_smooth off
by 7.6e3). This script runs cholesky.inverse_batched / cholesky_batched
— the SAME blocked in-place routines in a tiny standalone pallas_call —
on the real rodent mass matrix, against the XLA oracle, isolating:
  kernel-routines-wrong  vs  mega-kernel-context-wrong (scratch reuse,
  paired lanes, const pipelines).

Usage: python tpu_chol_check.py [--model rodent_new.xml] [--envs 256]
"""

import argparse
import json
import os

import numpy as np


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--envs", type=int, default=256)
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.utils.cache import configure_cache
  configure_cache(os.path.dirname(os.path.abspath(__file__)))

  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.ops import cholesky as ch
  from brax_rodent_run_tpu.physics import smooth
  from brax_rodent_run_tpu.physics.types import make_data

  m = load_model(_model_path(args.model), solver="cg", iterations=8,
                 ls_iterations=8)
  d = make_data(m, dtype=jnp.float32)
  key = jax.random.PRNGKey(3)
  qpos = jnp.asarray(m.qpos0, jnp.float32) + jax.random.uniform(
      key, (m.nq,), jnp.float32, -0.1, 0.1)
  d = smooth.crb(m, smooth.com_pos(m, smooth.kinematics(
      m, d.replace(qpos=qpos))), factor=False)
  qM = np.asarray(d.qM, np.float64)
  B = args.envs
  jit_b = 1.0 + 0.01 * np.arange(B)
  Mb = jnp.asarray((qM[None] * jit_b[:, None, None]), jnp.float32)

  with jax.default_matmul_precision("highest"):
    ref_inv = np.asarray(jax.jit(jnp.linalg.inv)(
        jnp.asarray(Mb, jnp.float64)
        if jax.config.jax_enable_x64 else Mb), np.float64)

  out = {"backend": jax.default_backend(), "model": args.model,
         "envs": B, "nv": int(m.nv)}

  L = np.asarray(jax.jit(ch.cholesky_batched)(Mb), np.float64)
  recon = np.einsum("bij,bkj->bik", L, L)
  out["factor_recon_err"] = float(np.max(np.abs(
      recon - np.asarray(Mb, np.float64))))

  inv = np.asarray(jax.jit(ch.inverse_batched)(Mb), np.float64)
  out["inverse_vs_xla_err"] = float(np.max(np.abs(inv - ref_inv)))
  resid = np.einsum("bij,bjk->bik", inv, np.asarray(Mb, np.float64))
  eye = np.eye(m.nv)[None]
  out["inv_m_minus_i_err"] = float(np.max(np.abs(resid - eye)))
  out["ok"] = bool(out["factor_recon_err"] < 1e-2
                   and out["inv_m_minus_i_err"] < 1e-2)
  print(json.dumps(out))
  return 0 if out["ok"] else 1


if __name__ == "__main__":
  raise SystemExit(main())
