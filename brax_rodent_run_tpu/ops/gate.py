"""On-chip kernel numerics gate (shared by bench.py and
tpu_golden_check.py) — TWO checks:

1. MACHINERY (miscompile) gate: the batched Pallas kernel pinned to
   SEQUENTIAL line search vs the unbatched XLA stage composition at
   highest matmul precision, same chip, K distinct states interleaved
   across lanes. Budget KERNEL_BUDGET: both sides implement the same
   algorithm in f32, so only Mosaic miscompiles or precision bugs can
   exceed it.
2. LEVER gate: the PRODUCTION-flags kernel (parallel line search) vs
   the sequential kernel, both batched on-chip. Parallel LS is NOT
   bitwise semantics-preserving — step sizes move within line-search
   tolerance (PERF_NOTES r3 lever 7, documented 5e-2 envelope) — so
   gating production flags against the stage at the machinery budget
   would fail BY DESIGN. This part bounds the lever's deviation at its
   own envelope and still catches lspar-only miscompiles.

Distinct states matter: with identical lanes every env's CG converges
in lockstep, so per-env mask bugs are invisible (round 4's `done[0]`
regression). Heterogeneous lanes make the per-env masks load-bearing.

Contract reference: /root/reference/Rodent_Env_Brax.py:98-136 — the
control step the kernel must reproduce.
"""

import os

import numpy as np

# machinery budget: same algorithm both sides, f32; interpret parity
# measures ~1e-5 at n10, so 5e-3 leaves headroom while catching real
# miscompiles (r4/r5 failures measured 14.7-25.8)
KERNEL_BUDGET = 5e-3
# parallel-LS lever envelope PER SUBSTEP (PERF_NOTES r3 #7;
# interpret-tested). The lever is a solver VARIANT: its step sizes move
# within line-search tolerance, so trajectories diverge chaotically over
# substeps exactly like any solver-tolerance change would (measured
# on-chip: 1e-3-class machinery error but 4.5 lever divergence after 10
# substeps). The principled bound is therefore per-substep, where chaos
# cannot amplify.
LEVER_BUDGET = 5e-2


def _build_states(m, n_distinct, seed):
  import jax.numpy as jnp
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data
  rng = np.random.RandomState(seed)
  qpos0 = np.asarray(m.qpos0, np.float32)
  states = []
  for _ in range(n_distinct):
    qp = qpos0 + rng.uniform(-0.01, 0.01, qpos0.shape).astype(np.float32)
    qv = rng.uniform(-0.1, 0.1, (m.nv,)).astype(np.float32)
    u = rng.uniform(-0.5, 0.5, (m.nu,)).astype(np.float32)
    d = make_data(m, dtype=jnp.float32)
    d = d.replace(qpos=jnp.asarray(qp), qvel=jnp.asarray(qv),
                  ctrl=jnp.asarray(u))
    states.append(forward.fwd_position(m, d))
  return states


def _batched_kernel_run(m, states, idx, n_frames):
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.physics import forward

  def ctrl_step(d):
    return forward.pipeline_steps_fused(m, d, n_frames, sensors=False)

  db = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs)[idx], *states)
  return jax.jit(jax.vmap(ctrl_step))(db)


def _clear_kernel_caches():
  from brax_rodent_run_tpu.ops import fused_full as ff
  ff._kernel.cache_clear()
  ff._kernel_steps.cache_clear()


def full_gate(m, batch: int = 128, n_distinct: int = 8,
              n_frames: int = 10, seed: int = 3):
  """dict with seq_err (machinery), lever_err (production vs seq, None
  when production IS sequential), n_skipped (contact-borderline states
  excluded from the stage compare), ok. None when `m` is not
  kernel-eligible."""
  import jax
  from brax_rodent_run_tpu.ops import fused_full as ff
  from brax_rodent_run_tpu.physics import forward

  if not ff.eligible_steps(m):
    return None

  K = n_distinct
  states = _build_states(m, K, seed)
  idx = np.arange(batch) % K

  prod_is_par = ff._ls_par()
  # ---- part 1: sequential machinery gate
  if prod_is_par:
    os.environ["BRR_LS_SEQ"] = "1"
    _clear_kernel_caches()
  try:
    out_seq = _batched_kernel_run(m, states, idx, n_frames)

    def ctrl_step(d):
      return forward.pipeline_steps_fused(m, d, n_frames, sensors=False)

    # the stage reference runs at highest matmul precision: the TPU
    # default truncates f32 matmul operands to bf16, and that noise —
    # amplified through the ill-conditioned M^-1 and 10 chaotic
    # substeps — would swamp the budget (r5 postmortem)
    step_s = jax.jit(ctrl_step)
    seq_err = 0.0
    n_skipped = 0
    compare = []
    for k in range(K):
      with jax.default_matmul_precision("highest"):
        out_s = step_s(states[k])
      # borderline-contact guard: a contact with |dist| within f32
      # rounding of the activation threshold legitimately flips
      # active/inactive between two correct implementations, moving
      # qvel far beyond any reassociation budget. Resting contacts
      # penetrate ~1e-3 and must NOT trigger the skip.
      dist = np.asarray(out_s.contact.dist, np.float64)
      if dist.size and np.any(np.abs(dist) < 1e-4):
        n_skipped += 1
        continue
      compare.append((k, out_s))
    if not compare:      # all borderline: compare anyway (noisy > none)
      with jax.default_matmul_precision("highest"):
        compare = [(k, step_s(states[k])) for k in range(K)]
    for k, out_s in compare:
      sel = idx == k
      eq = np.max(np.abs(np.asarray(out_seq.qpos, np.float64)[sel]
                         - np.asarray(out_s.qpos, np.float64)[None]))
      ev = np.max(np.abs(np.asarray(out_seq.qvel, np.float64)[sel]
                         - np.asarray(out_s.qvel, np.float64)[None]))
      seq_err = max(seq_err, float(eq), float(ev))
  finally:
    if prod_is_par:
      os.environ.pop("BRR_LS_SEQ", None)
      _clear_kernel_caches()

  # ---- part 2: production-flags kernel vs sequential kernel, ONE
  # substep (see LEVER_BUDGET note: per-substep bounds the solver
  # variant where chaos cannot amplify; qvel carries h*qacc so the
  # budget is at the qacc*h scale)
  lever_err = None
  if prod_is_par:
    out_par1 = _batched_kernel_run(m, states, idx, n_frames=1)
    os.environ["BRR_LS_SEQ"] = "1"
    _clear_kernel_caches()
    try:
      out_seq1 = _batched_kernel_run(m, states, idx, n_frames=1)
    finally:
      os.environ.pop("BRR_LS_SEQ", None)
      _clear_kernel_caches()
    eq = np.max(np.abs(np.asarray(out_par1.qpos, np.float64)
                       - np.asarray(out_seq1.qpos, np.float64)))
    ev = np.max(np.abs(np.asarray(out_par1.qvel, np.float64)
                       - np.asarray(out_seq1.qvel, np.float64)))
    lever_err = float(max(eq, ev))

  ok = bool(seq_err < KERNEL_BUDGET)
  if lever_err is not None:
    ok = ok and bool(lever_err < LEVER_BUDGET)
  return {"seq_err": seq_err, "lever_err": lever_err,
          "n_skipped": n_skipped, "ok": ok,
          "seq_budget": KERNEL_BUDGET, "lever_budget": LEVER_BUDGET}


def kernel_vs_stage_err(m, batch: int = 128, n_distinct: int = 8,
                        n_frames: int = 10, seed: int = 3):
  """Back-compat scalar: the machinery (sequential) error, or None for
  kernel-ineligible models."""
  r = full_gate(m, batch=batch, n_distinct=n_distinct, n_frames=n_frames,
                seed=seed)
  if r is None:
    return None
  kernel_vs_stage_err.last = r
  kernel_vs_stage_err.last_n_skipped = r["n_skipped"]
  return r["seq_err"]
