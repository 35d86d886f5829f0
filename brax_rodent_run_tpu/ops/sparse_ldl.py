"""Leaf-first tree-sparse LDL factorization + path-sparse inverse.

Round-4 on-chip ablations (PERF_NOTES.md) showed the fused kernel's
factor+inverse sections run at ~VPU f32 peak — THROUGHPUT-bound, not
latency-bound as round 2/3 assumed. That flips the round-3 conclusion
that tree-sparse factorization is a losing trade: with throughput the
bound, a flop cut is a time cut.

The fill-free form is MuJoCo's leaf-first M = L^T D L (mj_factorM
semantics; reference behavior contract: the factorization MJX/MuJoCo
performs inside its solver, mujoco/src/engine/engine_core_smooth.c
mj_factorM — reimplemented from the tree recurrence, not translated):
eliminating dof k (k = nv-1 .. 0) updates only M[anc(k), anc(k)] where
anc(k) is k's strict-ancestor set in the dof tree — which for a tree is
closed under the update (no fill). On the rodent (nv=73, fill 41%):

  factor:   22k MACs vs 130k dense  (5.9x)
  L^-1:      9k vs 195k             (Y = L^-1 has the SAME path pattern)
  Y D^-1 Y^T: 45k vs 195k           (Y columns have CONTIGUOUS support:
                                     descendants of k = [k+1, desc_end))
  total:    76k vs 519k             (6.8x fewer VPU MACs per matrix)

Layout: batch-in-lanes (np_, np_, W) VMEM refs, same as ops/cholesky.py;
every op below is a static-slice elementwise multiply-accumulate over
ancestor RUNS (ancestor sets on the rodent have <= 2 contiguous runs),
so the instruction stream stays small while the flops drop ~7x.

API mirrors ops/cholesky.chol_routines: (factor, inverse) closures with
identical ref signatures, selected by ops/fused_full at kernel-build
time. The factor stores 1/D on the diagonal of l_ref and the unit-lower
L (strict part) at ancestor positions; `inverse` consumes that combined
buffer. Falls back (returns None) for any model whose dof descendants
are not contiguous index ranges.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics.types import Model


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


def _runs(idx):
  """Sorted index list -> list of (lo, hi) contiguous runs."""
  out = []
  for x in idx:
    if out and x == out[-1][1]:
      out[-1][1] = x + 1
    else:
      out.append([x, x + 1])
  return [(lo, hi) for lo, hi in out]


@dataclasses.dataclass(frozen=True)
class TreeMeta:
  n: int                      # real dof count
  np_: int                    # padded (factor loops run over np_)
  anc: tuple                  # anc[k]: ascending strict ancestors (tuple)
  anc_runs: tuple             # runs of anc[k]
  row_runs: tuple             # runs of anc[k] + [k] (Y row support)
  desc_end: tuple             # descendants-or-self of k = [k, desc_end[k])


@functools.lru_cache(maxsize=16)
def tree_meta(m: Model):
  """Static dof-tree metadata, or None when the sparse form is invalid
  (non-contiguous descendant ranges)."""
  nv = int(m.nv)
  np_ = _round_up(nv, 8)
  par = np.asarray(m.dof_parentid)
  anc = []
  for k in range(np_):
    a = []
    if k < nv:
      j = int(par[k])
      while j >= 0:
        a.append(j)
        j = int(par[j])
    anc.append(tuple(sorted(a)))
  desc_end = [k + 1 for k in range(np_)]
  for i in range(nv):
    for j in anc[i]:
      if i + 1 > desc_end[j]:
        desc_end[j] = i + 1
  # validity: descendants-or-self of k must be exactly [k, desc_end[k])
  n_desc = [0] * np_
  for i in range(nv):
    for j in anc[i]:
      n_desc[j] += 1
  for k in range(nv):
    if desc_end[k] - k != n_desc[k] + 1:
      return None
  return TreeMeta(
      n=nv, np_=np_,
      anc=tuple(anc),
      anc_runs=tuple(tuple(_runs(list(a))) for a in anc),
      row_runs=tuple(tuple(_runs(list(a) + [k])) for k, a in enumerate(anc)),
      desc_end=tuple(desc_end),
  )


_YROWBLK = 8    # Y row-recurrence panel height


def sparse_routines(meta: TreeMeta):
  """(factor, inverse) closures over the static tree metadata.

  factor(n, np_, a_ref, l_ref): leaf-first LDL of A (a_ref, destroyed)
    into l_ref: strict-lower L at ancestor positions, 1/D on the diag.
  inverse(np_, l_ref, x_ref, inv_ref): x_ref <- Y = L^-1 (row
    recurrence), inv_ref <- Y D^-1 Y^T via per-column contiguous
    outer-product accumulation.
  """
  anc_runs, row_runs = meta.anc_runs, meta.row_runs
  desc_end = meta.desc_end

  def factor(n, np_, a_ref, l_ref):
    assert np_ == meta.np_, (np_, meta.np_)
    lanes = a_ref.shape[-1]
    # zero strict part once: aggregated Y ops read full L columns and
    # rely on non-ancestor rows being exactly zero
    l_ref[:] = jnp.zeros((np_, np_, lanes), a_ref.dtype)
    for k in reversed(range(np_)):
      d = a_ref[k, k, :]
      invd = 1.0 / jnp.maximum(d, 1e-30)
      l_ref[k, k, :] = invd
      runs = anc_runs[k]
      if not runs:
        continue
      rows = [a_ref[k, lo:hi, :] for lo, hi in runs]        # unscaled
      scaled = [r * invd[None, :] for r in rows]
      for i, (lo, hi) in enumerate(runs):
        l_ref[k, lo:hi, :] = scaled[i]
      # M[anc, anc] -= L[k,anc] d L[k,anc]^T, lower-run pairs only
      # (row reads touch only strictly-lower positions; the full-square
      # same-run blocks write some upper entries that are never read)
      for a, (lo_a, hi_a) in enumerate(runs):
        for b in range(a + 1):
          lo_b, hi_b = runs[b]
          a_ref[lo_a:hi_a, lo_b:hi_b, :] = (
              a_ref[lo_a:hi_a, lo_b:hi_b, :]
              - scaled[a][:, None, :] * rows[b][None, :, :])

  def inverse(np_, l_ref, x_ref, inv_ref):
    assert np_ == meta.np_, (np_, meta.np_)
    lanes = l_ref.shape[-1]
    eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
    x_ref[:] = jnp.broadcast_to(eye2, (np_, np_, lanes)).astype(l_ref.dtype)
    # Y row recurrence (root-first): Y[i,:] = e_i - sum_{j in anc(i)}
    # L[i,j] Y[j,:], in _YROWBLK-row panels. Below-panel ancestor terms
    # are applied panel-wide per j (zero L entries mask non-members);
    # in-panel terms run per row as ONE fused contraction per run pair.
    for kb in range(0, np_, _YROWBLK):
      r1 = min(kb + _YROWBLK, np_)
      below = sorted({j for i in range(kb, r1) for j in meta.anc[i]
                      if j < kb})
      for j in below:
        lcol = l_ref[kb:r1, j, :]                           # (P, W)
        for lo, hi in row_runs[j]:
          x_ref[kb:r1, lo:hi, :] = (
              x_ref[kb:r1, lo:hi, :]
              - lcol[:, None, :] * x_ref[j, lo:hi, :][None, :, :])
      for i in range(kb + 1, r1):
        js = [j for j in meta.anc[i] if j >= kb]
        for lo, hi in _runs(js):
          lrow = l_ref[i, lo:hi, :]                         # (len, W)
          for clo, chi in row_runs[i]:
            if chi <= clo:
              continue
            upd = jnp.sum(
                lrow[:, None, :] * x_ref[lo:hi, clo:chi, :], axis=0)
            x_ref[i, clo:chi, :] = x_ref[i, clo:chi, :] - upd
    # inv = Y D^-1 Y^T: column k of Y is supported on the contiguous
    # descendant range [k, desc_end(k)); 1/D sits on l_ref's diagonal
    inv_ref[:] = jnp.zeros((np_, np_, lanes), l_ref.dtype)
    for k in range(np_):
      lo, hi = k, desc_end[k]
      col = x_ref[lo:hi, k, :]                              # (hi-lo, W)
      cols = col * l_ref[k, k, :][None, :]
      inv_ref[lo:hi, lo:hi, :] = (
          inv_ref[lo:hi, lo:hi, :]
          + cols[:, None, :] * col[None, :, :])

  return factor, inverse
