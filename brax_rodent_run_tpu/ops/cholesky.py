"""Batched SPD Cholesky as a Pallas TPU kernel.

The physics pipeline factors the (nv, nv) mass matrix (and the Euler
implicit-damping matrix M + h·diag(B)) once per substep per env
(smooth.factor_m, forward.euler). XLA's generic blocked Cholesky costs
~16 ms for a (2048, 73, 73) batch on one TPU chip — 2× per substep it
dominates the whole step (measured in profile_stages.py). nv is tiny and
the batch is huge, so the right mapping is **batch along lanes**: each
grid cell holds a (n, n, 128) tile in VMEM (one matrix per lane) and runs
an unrolled right-looking factorization — 8-16 VPU ops per column, no
MXU, no inter-lane traffic.

``spd_cholesky`` is the public entry: unbatched it is
``jax.scipy.linalg.cholesky``; under ``vmap`` (the physics pipeline is
written per-env and vmapped) a custom batching rule dispatches to the
kernel on TPU f32 and to XLA everywhere else (CPU float64 oracle tests,
odd dtypes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128

# test hook: run the kernel through the Pallas interpreter on any backend
# (used by the CPU test suite to exercise the kernel path)
FORCE_INTERPRET = False


def _round_up(x: int, m: int) -> int:
  return ((x + m - 1) // m) * m


# rank-1 sweeps only touch a shrinking/growing triangle; slicing at _BLK
# granularity cuts VPU work ~3x while keeping the distinct-shape count
# (and Mosaic compile time) small
_BLK = 16


def _blk_hi(k, np_):
  return min(_round_up(k + 1, _BLK), np_)


# ---------------------------------------------------------------------------
# Blocked (panel) variants: identical math, ~_R x fewer full-size serial
# steps. The per-column loop issues n dependent (np_, np_, 128) rank-1
# updates back-to-back — on TPU the chain is latency-bound, not
# throughput-bound. The blocked form factors an _R-wide panel with
# narrow intra-panel updates, then applies the panel to the trailing
# matrix as ONE sum of _R independent rank-1 terms the compiler can
# pipeline.
# ---------------------------------------------------------------------------

_R = 8


def _rsqrt_exact(x):
  """rsqrt with one Newton-Raphson refinement: the TPU VPU rsqrt is a
  ~2^-12-relative approximation, and that noise — amplified through the
  ill-conditioned explicit M^-1 — is visible in the r5 on-chip qminv
  fingerprints. One refinement step brings it to f32 rounding at ~4
  extra VPU ops per column."""
  r = jax.lax.rsqrt(x)
  return r * (1.5 - 0.5 * x * r * r)




def _chol_inplace_blocked(n, np_, a_ref, l_ref):
  """Blocked right-looking factorization of A (destroyed) into l_ref."""
  rows = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
  dtype = a_ref.dtype
  for kb in range(0, n, _R):
    r1 = min(kb + _R, n)
    cols = []
    for k in range(kb, r1):
      akk = a_ref[k, k, :]
      inv = _rsqrt_exact(jnp.maximum(akk, 1e-30))
      col = a_ref[:, k, :] * inv[None, :]
      col = jnp.where(rows >= k, col, 0.0)
      l_ref[:, k, :] = col
      cols.append(col)
      if k + 1 < r1:
        # narrow intra-panel update: only the remaining panel columns.
        # NB: slice into a temp BEFORE newaxis-indexing — a getitem
        # mixing a bounded slice with None lowers to a gather this
        # jax's Mosaic cannot compile (BENCH_r03 rung-0 failure).
        cl, cr = col[kb:], col[k + 1:r1]
        a_ref[kb:, k + 1:r1, :] = (
            a_ref[kb:, k + 1:r1, :] - cl[:, None, :] * cr[None, :, :])
    if r1 < n:
      # one rank-(r1-kb) trailing update: independent terms, one store
      c0 = cols[0][r1:]
      upd = c0[:, None, :] * c0[None, :, :]
      for col in cols[1:]:
        ct = col[r1:]
        upd = upd + ct[:, None, :] * ct[None, :, :]
      a_ref[r1:, r1:, :] = a_ref[r1:, r1:, :] - upd
  lanes = a_ref.shape[-1]
  for k in range(n, np_):                           # identity padding
    l_ref[:, k, :] = jnp.broadcast_to(
        jnp.where(rows == k, 1.0, 0.0), (np_, lanes)).astype(dtype)


def _inv_from_chol_inplace_blocked(np_, l_ref, x_ref, inv_ref):
  """Blocked L^-1 forward substitution + X^T X accumulation."""
  eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
          == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
  lanes = l_ref.shape[-1]
  x_ref[:] = jnp.broadcast_to(eye2, (np_, np_, lanes)).astype(l_ref.dtype)
  for kb in range(0, np_, _R):
    r1 = min(kb + _R, np_)
    hi = _blk_hi(r1 - 1, np_)
    xs = []
    for k in range(kb, r1):
      inv_diag = 1.0 / jnp.maximum(l_ref[k, k, :], 1e-30)
      xk = x_ref[k, :hi, :] * inv_diag[None, :]
      x_ref[k, :hi, :] = xk
      xs.append(xk)
      if k + 1 < r1:
        x_ref[k + 1:r1, :hi, :] = (
            x_ref[k + 1:r1, :hi, :]
            - l_ref[k + 1:r1, k, :][:, None, :] * xk[None, :, :])
    if r1 < np_:
      upd = l_ref[r1:, kb, :][:, None, :] * xs[0][None, :, :]
      for j, k in enumerate(range(kb + 1, r1)):
        upd = upd + l_ref[r1:, k, :][:, None, :] * xs[j + 1][None, :, :]
      x_ref[r1:, :hi, :] = x_ref[r1:, :hi, :] - upd
  inv_ref[:] = jnp.zeros((np_, np_, lanes), l_ref.dtype)
  for kb in range(0, np_, _R):
    r1 = min(kb + _R, np_)
    hi = _blk_hi(r1 - 1, np_)
    xk = x_ref[kb, :hi, :]
    upd = xk[:, None, :] * xk[None, :, :]
    for k in range(kb + 1, r1):
      xk = x_ref[k, :hi, :]
      upd = upd + xk[:, None, :] * xk[None, :, :]
    inv_ref[:hi, :hi, :] = inv_ref[:hi, :hi, :] + upd


# ---------------------------------------------------------------------------
# Tree-aware REVERSE-order (leaf-first) blocked factorization: M = U U^T
# with U upper-triangular. Reverse elimination of a kinematic-tree mass
# matrix is FILL-FREE (MuJoCo's own L^T D L order, mj_factorM): column k
# of U is supported exactly on anc(k) ∪ {k}, so every trailing update
# can be restricted to the panel's ancestor tiles. Measured on the
# rodent (dof order = DFS ⇒ ancestor tiles form ≤2 contiguous runs per
# 8-panel): only 24.7% of trailing-update work remains (9.2% on
# rodent_pair, 60% on humanoid) at IDENTICAL wide-tile op structure —
# unlike r4's per-column sparse LDL, whose scattered narrow row ops lost
# to op-issue overhead. M^-1 = U^-T U^-1 is basis-independent, so no
# consumer changes.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def chol_tree_meta(dof_parentid: tuple, n: int, np_: int):
  """Static sparsity metadata for the reverse blocked factorization, or
  None when the dof order lacks subtree contiguity (fall back dense).

  Returns (runs, de):
    runs[pb] — tuple of (lo, hi) 8-aligned element ranges covering the
        ancestor tiles (incl. self) of panel pb's columns;
    de[pb]   — 8-aligned max subtree end over panel pb's columns (row/
        column extent of U^-1 rows in that panel).
  Padding dofs (k >= n) are isolated roots."""
  assert np_ % _R == 0
  anc_sets = []
  for k in range(np_):
    s = set()
    j = k if k < n else -1
    while j >= 0:
      s.add(j)
      j = dof_parentid[j]
    s.add(k)
    anc_sets.append(s)
  # subtree contiguity: descendants of j must be exactly range(j, de_j)
  de_elem = list(range(1, np_ + 1))
  for k in range(np_):
    for j in anc_sets[k]:
      de_elem[j] = max(de_elem[j], k + 1)
  for j in range(n):
    for i in range(j, de_elem[j]):
      if j not in anc_sets[i]:
        return None                    # non-contiguous subtree
  nb = np_ // _R
  runs = []
  de = []
  for pb in range(nb):
    kb, r1 = pb * _R, (pb + 1) * _R
    tiles = sorted({a // _R for k in range(kb, min(r1, np_))
                    for a in anc_sets[k]})
    rr = []
    for t in tiles:
      if rr and t == rr[-1][1]:
        rr[-1] = (rr[-1][0], t + 1)
      else:
        rr.append((t, t + 1))
    runs.append(tuple((lo * _R, hi * _R) for lo, hi in rr))
    de.append(_round_up(max(de_elem[k] for k in range(kb, r1)), _R))
  return tuple(runs), tuple(de)


def _make_chol_rev(meta):
  runs_tab, de_tab = meta

  def _chol_inplace_rev(n, np_, a_ref, u_ref):
    """Blocked reverse-order factorization A = U U^T (A destroyed),
    trailing updates restricted to ancestor runs."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
    nb = np_ // _R
    for pb in reversed(range(nb)):
      kb, r1 = pb * _R, min((pb + 1) * _R, n)
      if r1 <= kb:
        continue
      cols = []
      for k in reversed(range(kb, r1)):
        akk = a_ref[k, k, :]
        inv = _rsqrt_exact(jnp.maximum(akk, 1e-30))
        col = a_ref[:, k, :] * inv[None, :]
        col = jnp.where(rows <= k, col, 0.0)
        u_ref[:, k, :] = col
        cols.append(col)
        if k > kb:
          # intra-panel update of columns [kb, k), ancestor rows only
          cr = col[kb:k]
          for lo, hi in runs_tab[pb]:
            hi = min(hi, r1)
            if lo >= hi:
              continue
            cl = col[lo:hi]
            a_ref[lo:hi, kb:k, :] = (
                a_ref[lo:hi, kb:k, :] - cl[:, None, :] * cr[None, :, :])
      # trailing update on ancestor-run blocks above the panel
      truns = [(lo, min(hi, kb)) for lo, hi in runs_tab[pb] if lo < kb]
      for rlo, rhi in truns:
        for clo, chi in truns:
          c0 = cols[0]
          upd = c0[rlo:rhi][:, None, :] * c0[clo:chi][None, :, :]
          for col in cols[1:]:
            upd = upd + col[rlo:rhi][:, None, :] * col[clo:chi][None, :, :]
          a_ref[rlo:rhi, clo:chi, :] = a_ref[rlo:rhi, clo:chi, :] - upd
    lanes = a_ref.shape[-1]
    dtype = a_ref.dtype
    for k in range(n, np_):                          # identity padding
      u_ref[:, k, :] = jnp.broadcast_to(
          jnp.where(rows == k, 1.0, 0.0), (np_, lanes)).astype(dtype)

  def _inv_from_chol_rev(np_, u_ref, x_ref, inv_ref):
    """X = U^-1 (upper, row k supported on [k, de_k)), then
    inv = X^T X = (U U^T)^-1."""
    eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
    lanes = u_ref.shape[-1]
    x_ref[:] = jnp.broadcast_to(eye2, (np_, np_, lanes)).astype(u_ref.dtype)
    nb = np_ // _R
    for pb in reversed(range(nb)):
      kb, r1 = pb * _R, (pb + 1) * _R
      hi = de_tab[pb]
      xs = []
      for k in reversed(range(kb, r1)):
        inv_diag = 1.0 / jnp.maximum(u_ref[k, k, :], 1e-30)
        xk = x_ref[k, kb:hi, :] * inv_diag[None, :]
        x_ref[k, kb:hi, :] = xk
        xs.append(xk)
        if k > kb:
          uc = u_ref[kb:k, k, :]
          x_ref[kb:k, kb:hi, :] = (
              x_ref[kb:k, kb:hi, :] - uc[:, None, :] * xk[None, :, :])
      truns = [(lo, min(h, kb)) for lo, h in runs_tab[pb] if lo < kb]
      for rlo, rhi in truns:
        k0 = r1 - 1
        upd = u_ref[rlo:rhi, k0, :][:, None, :] * xs[0][None, :, :]
        for j, k in enumerate(reversed(range(kb, r1 - 1))):
          upd = upd + (u_ref[rlo:rhi, k, :][:, None, :]
                       * xs[j + 1][None, :, :])
        x_ref[rlo:rhi, kb:hi, :] = x_ref[rlo:rhi, kb:hi, :] - upd
    inv_ref[:] = jnp.zeros((np_, np_, lanes), u_ref.dtype)
    for pb in range(nb):
      kb, r1 = pb * _R, (pb + 1) * _R
      hi = de_tab[pb]
      xk = x_ref[kb, kb:hi, :]
      upd = xk[:, None, :] * xk[None, :, :]
      for k in range(kb + 1, r1):
        xk = x_ref[k, kb:hi, :]
        upd = upd + xk[:, None, :] * xk[None, :, :]
      inv_ref[kb:hi, kb:hi, :] = inv_ref[kb:hi, kb:hi, :] + upd

  return _chol_inplace_rev, _inv_from_chol_rev


def chol_routines(tree_meta=None):
  """(factor, inverse) in-place routines. With `tree_meta` (from
  chol_tree_meta): reverse-order tree-run-restricted blocked panels —
  the r5 lever. Without: dense blocked panels (the r2-r4 default; the
  per-column forms and their BRR_CHOL_COL selector were pruned in r5 —
  blocked won every on-chip A/B since r2; see git history)."""
  if tree_meta is not None:
    return _make_chol_rev(tree_meta)
  return _chol_inplace_blocked, _inv_from_chol_inplace_blocked


@functools.lru_cache(maxsize=32)
def _factor_kernel(n: int, np_: int, interpret: bool = False):
  """Unrolled right-looking Cholesky on a (np_, np_, 128) VMEM tile."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  _factor, _ = chol_routines()

  def kernel(a_ref, l_ref, scratch):
    scratch[:] = a_ref[:]
    _factor(n, np_, scratch, l_ref)

  def call(x):                                      # (np_, np_, B)
    B = x.shape[-1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, np_, B), x.dtype),
        grid=(B // _LANES,),
        in_specs=[pl.BlockSpec((np_, np_, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((np_, np_, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((np_, np_, _LANES), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)

  return call


@functools.lru_cache(maxsize=32)
def _inverse_kernel(n: int, np_: int, interpret: bool = False):
  """SPD inverse on a (np_, np_, 128) VMEM tile: factor, invert L by
  forward substitution, form A^-1 = L^-T L^-1. Turns every downstream
  mass-matrix solve into one MXU-friendly matvec (XLA's batched
  triangular_solve / Cholesky are the hottest ops in the physics substep
  otherwise)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  _factor, _inverse = chol_routines()

  def kernel(a_ref, inv_ref, s_a, s_l):
    s_a[:] = a_ref[:]
    _factor(n, np_, s_a, s_l)
    # s_a is destroyed; reuse it as the X buffer
    _inverse(np_, s_l, s_a, inv_ref)

  def call(x):
    B = x.shape[-1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, np_, B), x.dtype),
        grid=(B // _LANES,),
        in_specs=[pl.BlockSpec((np_, np_, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((np_, np_, _LANES),
                               lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((np_, np_, _LANES), x.dtype),
                        pltpu.VMEM((np_, np_, _LANES), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)

  return call


def cholesky_batched(M: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky of a batch of SPD matrices (B, n, n)."""
  B, n, _ = M.shape
  interpret = FORCE_INTERPRET
  if not interpret and (jax.default_backend() != "tpu"
                        or M.dtype != jnp.float32 or n > 256):
    return jax.scipy.linalg.cholesky(M, lower=True)
  np_ = _round_up(n, 8)
  Bp = _round_up(max(B, _LANES), _LANES)
  x = jnp.transpose(M, (1, 2, 0))                   # (n, n, B)
  x = jnp.pad(x, ((0, np_ - n), (0, np_ - n), (0, Bp - B)))
  # identity on the diagonal padding keeps rsqrt well-defined
  if np_ > n:
    pad_eye = jnp.zeros((np_, np_, 1), M.dtype).at[
        jnp.arange(n, np_), jnp.arange(n, np_), 0].set(1.0)
    x = x + pad_eye
  L = _factor_kernel(n, np_, interpret)(x)
  return jnp.transpose(L[:n, :n, :B], (2, 0, 1))


def inverse_batched(M: jax.Array) -> jax.Array:
  """Inverse of a batch of SPD matrices (B, n, n) via the fused kernel."""
  B, n, _ = M.shape
  interpret = FORCE_INTERPRET
  if not interpret and (jax.default_backend() != "tpu"
                        or M.dtype != jnp.float32 or n > 256):
    L = jax.scipy.linalg.cholesky(M, lower=True)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    return jax.scipy.linalg.cho_solve((L, True), eye)
  np_ = _round_up(n, 8)
  Bp = _round_up(max(B, _LANES), _LANES)
  x = jnp.transpose(M, (1, 2, 0))
  x = jnp.pad(x, ((0, np_ - n), (0, np_ - n), (0, Bp - B)))
  if np_ > n:
    pad_eye = jnp.zeros((np_, np_, 1), M.dtype).at[
        jnp.arange(n, np_), jnp.arange(n, np_), 0].set(1.0)
    x = x + pad_eye
  inv = _inverse_kernel(n, np_, interpret)(x)
  return jnp.transpose(inv[:n, :n, :B], (2, 0, 1))


@jax.custom_batching.custom_vmap
def spd_inverse(M: jax.Array) -> jax.Array:
  """Inverse of one SPD matrix; batches (via vmap) hit the TPU kernel."""
  L = jax.scipy.linalg.cholesky(M, lower=True)
  eye = jnp.eye(M.shape[-1], dtype=M.dtype)
  return jax.scipy.linalg.cho_solve((L, True), eye)


@spd_inverse.def_vmap
def _spd_inverse_vmap(axis_size, in_batched, M):
  del axis_size
  (m_batched,) = in_batched
  if not m_batched:
    L = jax.scipy.linalg.cholesky(M, lower=True)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return jax.scipy.linalg.cho_solve((L, True), eye), False
  if M.ndim > 3:
    lead = M.shape[:-2]
    flat = M.reshape((-1,) + M.shape[-2:])
    return inverse_batched(flat).reshape(lead + M.shape[-2:]), True
  return inverse_batched(M), True


@jax.custom_batching.custom_vmap
def spd_cholesky(M: jax.Array) -> jax.Array:
  """Cholesky of one SPD matrix; batches (via vmap) hit the TPU kernel."""
  return jax.scipy.linalg.cholesky(M, lower=True)


@spd_cholesky.def_vmap
def _spd_cholesky_vmap(axis_size, in_batched, M):
  del axis_size
  (m_batched,) = in_batched
  if not m_batched:
    return jax.scipy.linalg.cholesky(M, lower=True), False
  if M.ndim > 3:
    # nested vmap: flatten leading dims through the kernel
    lead = M.shape[:-2]
    flat = M.reshape((-1,) + M.shape[-2:])
    return cholesky_batched(flat).reshape(lead + M.shape[-2:]), True
  return cholesky_batched(M), True


# ---------------------------------------------------------------------------
# FUNCTIONAL (value-based) reverse-order blocked factor + inverse.
#
# r5 on-chip forensics: the in-place VMEM-ref routines above are EXACT in
# a small standalone pallas_call (tpu_chol_check.py: factor 2.4e-7,
# inverse residual 3.6e-4) but produce garbage qminv when embedded in the
# whole-control-step mega-kernel (row-sum fingerprint off by 1.7e6 while
# the qm input fingerprint matches to 3e-4) — identically under paired
# AND split scratch modes. Everything points at Mosaic mis-scheduling
# long in-place ref mutation chains under the mega-kernel's register/
# VMEM pressure. This variant expresses the SAME reverse-order blocked
# elimination on SSA VALUES (static .at[...] slice updates, no refs), so
# the compiler's ordinary dataflow ordering applies. Structure (panels,
# ancestor-run restriction) mirrors _make_chol_rev.
# ---------------------------------------------------------------------------


def _dense_meta(n: int, np_: int):
  """Full-range runs/de tables: the dense instance of the tree form."""
  nb = np_ // _R
  runs = tuple((((0, (pb + 1) * _R)),) for pb in range(nb))
  de = tuple(np_ for _ in range(nb))
  return runs, de


def _val_sub(A, r0, c0, upd):
  """A[r0:r0+h, c0:c0+w, :] -= upd, expressed as a full-size subtract of
  the zero-padded update. All offsets are Python ints, so jnp.pad is a
  static op; Mosaic's Pallas lowering supports neither scatter (what
  .at[] captures) nor dynamic_slice, but pad/add it handles. The
  restricted OUTER PRODUCT still bounds the multiply work; only the
  add widens to full size."""
  h, w, _ = upd.shape
  n0, n1, _ = A.shape
  return A - jnp.pad(upd, ((r0, n0 - r0 - h), (c0, n1 - c0 - w), (0, 0)))


def _val_addat(A, r0, c0, upd):
  h, w, _ = upd.shape
  n0, n1, _ = A.shape
  return A + jnp.pad(upd, ((r0, n0 - r0 - h), (c0, n1 - c0 - w), (0, 0)))


def _val_setrow(A, k, c0, row):
  """A[k, c0:c0+w, :] = row ((w, L)) via a one-row mask select."""
  n0, n1, _ = A.shape
  rowp = jnp.pad(row, ((c0, n1 - c0 - row.shape[0]), (0, 0)))
  m0 = jax.lax.broadcasted_iota(jnp.int32, (n0, 1, 1), 0) == k
  return jnp.where(m0, rowp[None, :, :], A)


def chol_inverse_value(n, np_, A, meta=None):
  """(U, inv) = reverse-order blocked factorization A = U U^T and
  inv = A^-1 = U^-T U^-1, computed functionally on the (np_, np_, L)
  VALUE `A`. `meta` as from chol_tree_meta (None = dense ranges)."""
  runs_tab, de_tab = meta if meta is not None else _dense_meta(n, np_)
  rows1 = jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0)
  lanes = A.shape[-1]
  dtype = A.dtype
  nb = np_ // _R

  cols = [None] * np_
  for k in range(n, np_):                            # identity padding
    cols[k] = jnp.broadcast_to(
        jnp.where(rows1 == k, 1.0, 0.0), (np_, lanes)).astype(dtype)
  for pb in reversed(range(nb)):
    kb, r1 = pb * _R, min((pb + 1) * _R, n)
    if r1 <= kb:
      continue
    pan = []
    for k in reversed(range(kb, r1)):
      akk = A[k, k, :]
      inv_d = _rsqrt_exact(jnp.maximum(akk, 1e-30))
      col = A[:, k, :] * inv_d[None, :]
      col = jnp.where(rows1 <= k, col, 0.0)
      cols[k] = col
      pan.append(col)
      if k > kb:
        cr = col[kb:k]
        for lo, hi in runs_tab[pb]:
          hi = min(hi, r1)
          if lo >= hi:
            continue
          cl = col[lo:hi]
          A = _val_sub(A, lo, kb, cl[:, None, :] * cr[None, :, :])
    truns = [(lo, min(hi, kb)) for lo, hi in runs_tab[pb] if lo < kb]
    for rlo, rhi in truns:
      for clo, chi in truns:
        upd = pan[0][rlo:rhi][:, None, :] * pan[0][clo:chi][None, :, :]
        for col in pan[1:]:
          upd = upd + col[rlo:rhi][:, None, :] * col[clo:chi][None, :, :]
        A = _val_sub(A, rlo, clo, upd)
  U = jnp.stack(cols, axis=1)                         # (np_, np_, L)

  eye2 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
          == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
  X = jnp.broadcast_to(eye2, (np_, np_, lanes)).astype(dtype)
  for pb in reversed(range(nb)):
    kb, r1 = pb * _R, (pb + 1) * _R
    hi = de_tab[pb]
    xs = []
    for k in reversed(range(kb, r1)):
      inv_d = 1.0 / jnp.maximum(U[k, k, :], 1e-30)
      xk = X[k, kb:hi, :] * inv_d[None, :]
      X = _val_setrow(X, k, kb, xk)
      xs.append(xk)
      if k > kb:
        uc = U[kb:k, k, :]
        X = _val_sub(X, kb, kb, uc[:, None, :] * xk[None, :, :])
    truns = [(lo, min(h, kb)) for lo, h in runs_tab[pb] if lo < kb]
    for rlo, rhi in truns:
      k0 = r1 - 1
      upd = U[rlo:rhi, k0, :][:, None, :] * xs[0][None, :, :]
      for j, k in enumerate(reversed(range(kb, r1 - 1))):
        upd = upd + (U[rlo:rhi, k, :][:, None, :] * xs[j + 1][None, :, :])
      X = _val_sub(X, rlo, kb, upd)
  inv = jnp.zeros((np_, np_, lanes), dtype)
  for pb in range(nb):
    kb, r1 = pb * _R, (pb + 1) * _R
    hi = de_tab[pb]
    xk = X[kb, kb:hi, :]
    upd = xk[:, None, :] * xk[None, :, :]
    for k in range(kb + 1, r1):
      xk = X[k, kb:hi, :]
      upd = upd + xk[:, None, :] * xk[None, :, :]
    inv = _val_addat(inv, kb, kb, upd)
  return U, inv
