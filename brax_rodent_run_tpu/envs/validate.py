"""Env-contract audits.

``assert_lean_autoreset_equivalent`` is the gate a NEW env class must pass
before enabling ``lean_autoreset`` in training (ADVICE r2): the lean
wrapper restores only the state-defining pipeline fields plus whatever the
env declares in ``autoreset_carry_fields``; an env that silently reads any
other pre-step derived Data field in ``step()`` computes its first
post-reset reward/obs from the PRE-reset trajectory. Driving both wrappers
through several forced auto-resets and diffing every observable catches
exactly that class of bug (the cached first-state fields differ from the
stale post-step values, so a missed carry field shows up as an obs/reward
mismatch on the reset step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.envs.base import Env
from brax_rodent_run_tpu.envs.wrappers import wrap_for_training


def assert_lean_autoreset_equivalent(
    env: Env,
    *,
    episode_length: int = 3,
    batch: int = 3,
    n_steps: int = 7,
    seed: int = 11,
    action_scale: float = 0.3,
) -> None:
  """Step ``env`` under LeanAutoResetWrapper and AutoResetWrapper in
  lockstep across >= 2 forced auto-resets and assert every observable
  (obs, reward, done, steps, qpos/qvel/act) is bit-identical.

  Raises AssertionError naming the first diverging field — if it fires on
  the step where ``done`` was 1, the env reads a pre-step derived Data
  field it did not declare in ``autoreset_carry_fields``.
  """
  assert n_steps > 2 * episode_length, (
      "n_steps must cover at least two auto-resets to exercise the "
      "cached-first-state path")
  rng = jax.random.split(jax.random.PRNGKey(seed), batch)
  envc = wrap_for_training(env, episode_length=episode_length)
  envl = wrap_for_training(env, episode_length=episode_length,
                           lean_autoreset=True)
  sc = jax.jit(envc.reset)(rng)
  sl = jax.jit(envl.reset)(rng)
  stepc = jax.jit(envc.step)
  stepl = jax.jit(envl.step)
  key = jax.random.PRNGKey(seed + 1)
  for t in range(n_steps):
    key, akey = jax.random.split(key)
    a = jax.random.uniform(akey, (batch, env.action_size), jnp.float32,
                           -action_scale, action_scale)
    was_done = np.asarray(sc.done)
    sc = stepc(sc, a)
    sl = stepl(sl, a)
    ctx = (f"step {t} (post-auto-reset step: {bool(was_done.any())}) — "
           "if this is a post-reset step, the env likely reads a derived "
           "Data field missing from autoreset_carry_fields")
    for name in ("obs", "reward", "done"):
      np.testing.assert_array_equal(
          np.asarray(getattr(sc, name)), np.asarray(getattr(sl, name)),
          err_msg=f"{name} @ {ctx}")
    for f in ("qpos", "qvel", "act"):
      np.testing.assert_array_equal(
          np.asarray(getattr(sc.pipeline_state, f)),
          np.asarray(getattr(sl.pipeline_state, f)),
          err_msg=f"pipeline_state.{f} @ {ctx}")
    np.testing.assert_array_equal(
        np.asarray(sc.info["steps"]), np.asarray(sl.info["steps"]),
        err_msg=f"info.steps @ {ctx}")
