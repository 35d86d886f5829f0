"""Primitive collision narrowphase over the static pair table.

MuJoCo's broadphase+narrowphase (exercised through MJX at
Rodent_Env_Brax.py:101; contact filtering is entirely static
contype/conaffinity per SURVEY.md §2.2) is replaced by a compile-time pair
table (mjcf/from_mj.py build_contact_slots). At runtime we evaluate *every*
slot, batched and branch-free: slots are grouped by geom-type pair and each
group runs as one vectorized kernel over the group's slots (and, under vmap,
over the env batch). Inactive contacts are masked by distance downstream —
no dynamic shapes anywhere.

Conventions match MuJoCo: contact normal points from geom1 toward geom2,
dist < 0 means penetration, contact pos is the midpoint between surfaces,
frame rows are [normal, tangent1, tangent2].
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_rodent_run_tpu.physics import math
from brax_rodent_run_tpu.physics.types import Contact, Data, GeomType, Model


def make_frame(normal: jax.Array,
               tangent_hint: jax.Array | None = None) -> jax.Array:
  """Build the contact frame [n, t1, t2] (mju_makeFrame semantics).

  Default: t1 is the world axis least aligned with n, orthogonalized.
  If a collider supplies ``tangent_hint`` (e.g. the capsule axis for
  plane-capsule, matching mjc_PlaneCapsule), t1 is its projection onto the
  contact plane, falling back to the default when degenerate. Branch-free.
  """
  n = math.normalize(normal)
  an = jnp.abs(n)
  # least-aligned world axis: x if |nx| smallest, else y if |ny|<|nz|, else z
  is_x = (an[..., 0:1] < an[..., 1:2]) & (an[..., 0:1] < an[..., 2:3])
  is_y = ~is_x & (an[..., 1:2] < an[..., 2:3])
  ex = jnp.array([1.0, 0.0, 0.0], n.dtype)
  ey = jnp.array([0.0, 1.0, 0.0], n.dtype)
  ez = jnp.array([0.0, 0.0, 1.0], n.dtype)
  tmp = jnp.where(is_x, ex, jnp.where(is_y, ey, ez))
  t1 = tmp - n * jnp.sum(n * tmp, axis=-1, keepdims=True)
  if tangent_hint is not None:
    hint = tangent_hint - n * jnp.sum(n * tangent_hint, axis=-1,
                                      keepdims=True)
    hnorm = jnp.linalg.norm(hint, axis=-1, keepdims=True)
    t1 = jnp.where(hnorm > 1e-8, jnp.where(hnorm > 1e-8, hint, t1), t1)
  t1 = math.normalize(t1)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2], axis=-2)


# Each narrowphase fn takes geom world poses/sizes for a *batch of slots* of
# one type pair and returns (dist, pos) with shapes (S, P) and (S, P, 3) and
# normal (S, P, 3), where P = max points for that type pair.


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]                                  # plane z in world (S,3)
  cdist = jnp.sum(n * (p2 - p1), axis=-1)            # center height
  r = s2[..., 0]
  dist = cdist - r
  pos = p2 - n * (r + 0.5 * dist)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  axis = m2[..., :, 2]                               # capsule axis (S,3)
  r, hl = s2[..., 0], s2[..., 1]
  ends = jnp.stack([p2 + axis * hl[..., None],
                    p2 - axis * hl[..., None]], axis=-2)   # (S,2,3)
  cdist = jnp.sum(n[..., None, :] * (ends - p1[..., None, :]), axis=-1)
  dist = cdist - r[..., None]                        # (S,2)
  pos = ends - n[..., None, :] * (r[..., None] + 0.5 * dist)[..., None]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  hint = jnp.broadcast_to(axis[..., None, :], pos.shape)
  return dist, pos, nrm, hint


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  nl = jnp.einsum('...ij,...i->...j', m2, n)          # normal in ellip frame
  denom = jnp.linalg.norm(s2 * nl, axis=-1)
  support_l = -(s2 * s2 * nl) / jnp.maximum(denom, 1e-12)[..., None]
  point = p2 + jnp.einsum('...ij,...j->...i', m2, support_l)
  dist = jnp.sum(n * (point - p1), axis=-1)
  pos = point - 0.5 * dist[..., None] * n
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[..., :, 2]
  # 8 corners in world
  signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                     for sz in (-1, 1)], dtype=p2.dtype)       # (8,3)
  corners = p2[..., None, :] + jnp.einsum(
      '...ij,...kj->...ki', m2, signs * s2[..., None, :])      # (S,8,3)
  cdist = jnp.sum(n[..., None, :] * (corners - p1[..., None, :]), axis=-1)
  # keep the 4 deepest corners (static top-k via sort)
  order = jnp.argsort(cdist, axis=-1)
  take = order[..., :4]
  dist = jnp.take_along_axis(cdist, take, axis=-1)             # (S,4)
  pts = jnp.take_along_axis(corners, take[..., None], axis=-2)
  pos = pts - 0.5 * dist[..., None] * n[..., None, :]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  return dist, pos, nrm, None


def _sphere_sphere_raw(c1, r1, c2, r2):
  dvec = c2 - c1
  L = jnp.linalg.norm(dvec, axis=-1)
  n = dvec / jnp.maximum(L, 1e-12)[..., None]
  dist = L - (r1 + r2)
  pos = c1 + n * (r1 + 0.5 * dist)[..., None]
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_sphere_raw(p1, s1[..., 0], p2, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis = m2[..., :, 2]
  hl = s2[..., 1]
  t = jnp.clip(jnp.sum((p1 - p2) * axis, axis=-1), -hl, hl)
  c2 = p2 + axis * t[..., None]
  dist, pos, n = _sphere_sphere_raw(p1, s1[..., 0], c2, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _segment_closest(p1, a1, h1, p2, a2, h2):
  """Closest points between segments (p±a*h). Branch-free clamped solve."""
  r = p2 - p1
  A = jnp.sum(a1 * a1, axis=-1)       # = 1
  B = jnp.sum(a1 * a2, axis=-1)
  C = jnp.sum(a2 * a2, axis=-1)       # = 1
  D = jnp.sum(a1 * r, axis=-1)
  E = jnp.sum(a2 * r, axis=-1)
  den = A * C - B * B
  t1 = jnp.where(den > 1e-12, (D * C - B * E) / jnp.maximum(den, 1e-12), 0.0)
  t1 = jnp.clip(t1, -h1, h1)
  t2 = jnp.clip(t1 * B - E, -h2, h2)
  t1 = jnp.clip(t2 * B + D, -h1, h1)
  return p1 + a1 * t1[..., None], p2 + a2 * t2[..., None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  c1, c2 = _segment_closest(p1, m1[..., :, 2], s1[..., 1],
                            p2, m2[..., :, 2], s2[..., 1])
  dist, pos, n = _sphere_sphere_raw(c1, s1[..., 0], c2, s2[..., 0])
  return dist[..., None], pos[..., None, :], n[..., None, :], None


# ---- ellipsoid support machinery -----------------------------------------
#
# MuJoCo routes every non-plane ellipsoid pair through libccd MPR
# (mjc_Convex), which only produces contacts on penetration (margin 0).
# We instead compute ANALYTIC closest points (Newton on the KKT multiplier
# for point-vs-ellipsoid, fixed-iteration alternating projection for
# pair-vs-ellipsoid) — branch-free, vmap-able, and sign-compatible with the
# oracle: separated pairs give dist > 0 (inactive, exactly like MuJoCo's
# "no contact"), penetrating pairs give a true depth where MPR approximates.


def _ellipsoid_closest_point(p, semi, iters: int = 16):
  """Closest point on an origin-centered axis-aligned ellipsoid (semi-axes
  ``semi``) to point ``p``, both (..., 3) in the ellipsoid frame.

  Solves x_i = a_i^2 p_i / (a_i^2 + lam) with sum((x_i/a_i)^2) = 1 by
  safeguarded Newton on lam. For interior points the root is negative
  (lam > -min(a_i^2)); the clamp keeps iterates in-domain."""
  a2 = semi * semi
  lam_min = -0.999 * jnp.min(a2, axis=-1)

  def newton(_, lam):
    denom = a2 + lam[..., None]
    f = jnp.sum(a2 * p * p / (denom * denom), axis=-1) - 1.0
    df = -2.0 * jnp.sum(a2 * p * p / (denom * denom * denom), axis=-1)
    step = f / jnp.where(jnp.abs(df) > 1e-18, df, -1e-18)
    return jnp.maximum(lam - step, lam_min)

  lam = jax.lax.fori_loop(0, iters, newton, jnp.zeros_like(p[..., 0]))
  x = a2 * p / (a2 + lam[..., None])
  # degenerate p ~ center: pick the pole of the smallest axis
  pn = jnp.linalg.norm(p, axis=-1, keepdims=True)
  smallest = jnp.argmin(semi, axis=-1)
  pole = jax.nn.one_hot(smallest, 3, dtype=p.dtype) * semi
  return jnp.where(pn > 1e-12, x, pole)


def _point_ellipsoid_geom(p, pe, me, se):
  """World-frame closest point / outward normal / signed center-side flag
  for point ``p`` vs ellipsoid (pe, me, se). Returns (surface_pt, n_out,
  inside) where n_out points from the ellipsoid surface toward p when
  outside and dist = dot(p - surface_pt, n_out) is the signed distance."""
  pl = jnp.einsum('...ij,...i->...j', me, p - pe)      # into ellipsoid frame
  x = _ellipsoid_closest_point(pl, se)
  inside = (jnp.sum((pl / se) ** 2, axis=-1) < 1.0)
  # outward surface normal at x: grad of sum((x/a)^2) = 2 x / a^2
  n_l = math.normalize(x / (se * se))
  surface = pe + jnp.einsum('...ij,...j->...i', me, x)
  n_w = jnp.einsum('...ij,...j->...i', me, n_l)
  return surface, n_w, inside


def _sphere_ellipsoid(p1, m1, s1, p2, m2, s2):
  r = s1[..., 0]
  surf, n_out, inside = _point_ellipsoid_geom(p1, p2, m2, s2)
  sgn = jnp.where(inside, -1.0, 1.0)
  cdist = sgn * jnp.linalg.norm(p1 - surf, axis=-1)
  dist = cdist - r
  # normal points geom1 -> geom2 (sphere toward ellipsoid)
  n = -n_out
  pos = p1 + n * (r + 0.5 * dist)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _capsule_ellipsoid(p1, m1, s1, p2, m2, s2, iters: int = 6):
  """Closest point between a capsule segment and an ellipsoid by
  fixed-iteration alternating projection (segment pt -> ellipsoid surface
  -> re-clamp along segment)."""
  axis, hl, r = m1[..., :, 2], s1[..., 1], s1[..., 0]
  # init: segment point closest to the ellipsoid center
  def alternate(_, t):
    c = p1 + axis * t[..., None]
    surf, _, _ = _point_ellipsoid_geom(c, p2, m2, s2)
    return jnp.clip(jnp.sum((surf - p1) * axis, axis=-1), -hl, hl)

  t = jax.lax.fori_loop(
      0, iters, alternate,
      jnp.clip(jnp.sum((p2 - p1) * axis, axis=-1), -hl, hl))
  c = p1 + axis * t[..., None]
  surf, n_out, inside = _point_ellipsoid_geom(c, p2, m2, s2)
  sgn = jnp.where(inside, -1.0, 1.0)
  cdist = sgn * jnp.linalg.norm(c - surf, axis=-1)
  dist = cdist - r
  n = -n_out
  pos = c + n * (r + 0.5 * dist)[..., None]
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _ellipsoid_support(pe, me, se):
  """World-frame support-point fn of an ellipsoid (analytic, smooth)."""
  def supp(n):
    u = jnp.einsum('...ij,...i->...j', me, n)          # dir in ellip frame
    denom = jnp.sqrt(jnp.sum((se * u) ** 2, axis=-1, keepdims=True))
    xl = se * se * u / jnp.maximum(denom, 1e-12)
    return pe + jnp.einsum('...ij,...j->...i', me, xl)
  return supp


def _box_support(pb, mb, sb, smooth_eps: float = 1e-3):
  """World-frame support-point fn of a box (tanh-smoothed corners so the
  MTD gradient descent doesn't chatter on the nonsmooth vertices)."""
  def supp(n):
    u = jnp.einsum('...ij,...i->...j', mb, n)
    xl = sb * jnp.tanh(u / smooth_eps)
    return pb + jnp.einsum('...ij,...j->...i', mb, xl)
  return supp


def _mtd(supp1, supp2, n0, scale, iters: int = 80):
  """Signed separation between two convex bodies by slab duality.

  Minimizes pd(n) = <n, s1(n) - s2(-n)> over unit n (projected subgradient
  descent with 2/(k+3) decaying step, best-iterate tracking — envelope
  theorem gives grad = s1(n) - s2(-n)). At the minimum, -pd is the signed
  distance: positive gap when separated, minus the minimal-translation
  depth when overlapping, and the supports along n are the closest/deepest
  points. ``scale`` ~ body size normalizes the step. Branch-free."""
  inv = 1.0 / jnp.maximum(scale, 1e-9)
  pd0 = jnp.sum(n0 * (supp1(n0) - supp2(-n0)), axis=-1)

  def descend(k, carry):
    n, best_pd, best_n = carry
    g = supp1(n) - supp2(-n)
    g_t = g - n * jnp.sum(n * g, axis=-1, keepdims=True)
    step = inv * (2.0 / (k.astype(n.dtype) + 3.0))
    n = math.normalize(n - step[..., None] * g_t)
    pd = jnp.sum(n * (supp1(n) - supp2(-n)), axis=-1)
    better = pd < best_pd
    best_pd = jnp.where(better, pd, best_pd)
    best_n = jnp.where(better[..., None], n, best_n)
    return n, best_pd, best_n

  _, _, best_n = jax.lax.fori_loop(0, iters, descend, (n0, pd0, n0))
  sa = supp1(best_n)
  sb = supp2(-best_n)
  pd = jnp.sum(best_n * (sa - sb), axis=-1)
  return pd, best_n, 0.5 * (sa + sb)


def _ellipsoid_ellipsoid(p1, m1, s1, p2, m2, s2):
  """Two ellipsoids via the slab-duality MTD descent: for smooth convex
  bodies dist(A,B) = -min_n pd(n) holds in BOTH regimes (positive gap when
  separated, negative minimal-translation depth when overlapping), and the
  supports along the optimal n ARE the closest/deepest points."""
  scale = jnp.max(s1, axis=-1) + jnp.max(s2, axis=-1)
  pd, n, pos = _mtd(_ellipsoid_support(p1, m1, s1),
                    _ellipsoid_support(p2, m2, s2),
                    math.normalize(p2 - p1), scale)
  dist = -pd
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _sphere_box_raw(c, r, pb, mb, sb):
  """Sphere (center c, radius r) vs box (pb, mb, half-sizes sb)."""
  pl = jnp.einsum('...ij,...i->...j', mb, c - pb)      # center in box frame
  clamped = jnp.clip(pl, -sb, sb)
  outside = jnp.any(jnp.abs(pl) > sb, axis=-1)
  # outside: closest point is the clamp
  dvec = pl - clamped
  L = jnp.linalg.norm(dvec, axis=-1)
  n_out_l = dvec / jnp.maximum(L, 1e-12)[..., None]
  # inside: push to the nearest face
  face_gap = sb - jnp.abs(pl)                          # (.., 3) >= 0
  ax = jnp.argmin(face_gap, axis=-1)
  sign = jnp.sign(jnp.take_along_axis(pl, ax[..., None], axis=-1))
  sign = jnp.where(sign == 0, 1.0, sign)
  n_in_l = jax.nn.one_hot(ax, 3, dtype=c.dtype) * sign
  depth = jnp.take_along_axis(face_gap, ax[..., None], axis=-1)[..., 0]
  cdist = jnp.where(outside, L, -depth)
  n_l = jnp.where(outside[..., None], n_out_l, n_in_l)
  surf_l = jnp.where(outside[..., None], clamped,
                     pl + n_in_l * depth[..., None])
  n_w = jnp.einsum('...ij,...j->...i', mb, n_l)        # box -> sphere dir
  surf_w = pb + jnp.einsum('...ij,...j->...i', mb, surf_l)
  dist = cdist - r
  return dist, surf_w, n_w


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist, surf, n_bs = _sphere_box_raw(p1, s1[..., 0], p2, m2, s2)
  n = -n_bs                                            # sphere -> box
  pos = surf + 0.5 * dist[..., None] * (-n)
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _capsule_box(p1, m1, s1, p2, m2, s2, iters: int = 4):
  """Capsule vs box: sphere-box at both segment ends plus an alternating
  mid-segment candidate; emit the 2 deepest of the 3."""
  axis, hl, r = m1[..., :, 2], s1[..., 1], s1[..., 0]
  ends = jnp.stack([p1 + axis * hl[..., None],
                    p1 - axis * hl[..., None]], axis=-2)        # (S,2,3)
  # mid candidate: alternate clamp-to-box / clamp-to-segment
  def alternate(_, t):
    c = p1 + axis * t[..., None]
    pl = jnp.einsum('...ij,...i->...j', m2, c - p2)
    cl = jnp.clip(pl, -s2, s2)
    box_pt = p2 + jnp.einsum('...ij,...j->...i', m2, cl)
    return jnp.clip(jnp.sum((box_pt - p1) * axis, axis=-1), -hl, hl)

  t = jax.lax.fori_loop(0, iters, alternate, jnp.zeros_like(hl))
  mid = p1 + axis * t[..., None]
  cand = jnp.concatenate([ends, mid[..., None, :]], axis=-2)    # (S,3,3)
  rb = jnp.broadcast_to(r[..., None], cand.shape[:-1])
  dist3, surf3, n3 = _sphere_box_raw(
      cand, rb, p2[..., None, :],
      jnp.broadcast_to(m2[..., None, :, :], cand.shape[:-1] + (3, 3)),
      jnp.broadcast_to(s2[..., None, :], cand.shape))
  order = jnp.argsort(dist3, axis=-1)
  take = order[..., :2]
  dist = jnp.take_along_axis(dist3, take, axis=-1)              # (S,2)
  surf = jnp.take_along_axis(surf3, take[..., None], axis=-2)
  n_bs = jnp.take_along_axis(n3, take[..., None], axis=-2)
  n = -n_bs
  pos = surf + 0.5 * dist[..., None] * (-n)
  return dist, pos, n, None


def _ellipsoid_box(p1, m1, s1, p2, m2, s2):
  """Ellipsoid vs box via the same slab-duality MTD descent (box support
  corner-smoothed so the descent is differentiable)."""
  scale = jnp.max(s1, axis=-1) + jnp.max(s2, axis=-1)
  pd, n, pos = _mtd(_ellipsoid_support(p1, m1, s1),
                    _box_support(p2, m2, s2),
                    math.normalize(p2 - p1), scale)
  dist = -pd
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _box_box(p1, m1, s1, p2, m2, s2):
  """Box vs box via the slab-duality MTD descent on corner-smoothed
  supports (single deepest point; adequate for the incidental head-geom
  pairs that survive filtering — face-face manifolds are not needed
  there, rodent_cpu.xml skull/jaw boxes)."""
  scale = jnp.max(s1, axis=-1) + jnp.max(s2, axis=-1)
  pd, n, pos = _mtd(_box_support(p1, m1, s1),
                    _box_support(p2, m2, s2),
                    math.normalize(p2 - p1), scale)
  dist = -pd
  return dist[..., None], pos[..., None, :], n[..., None, :], None


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
  """Plane vs cylinder: deepest rim point of each cap + midpoint (3 pts,
  mjc_PlaneCylinder-style support points).

  Degenerate flat-resting case (axis ∥ plane normal): three points
  spread 120° around the DEEP cap's rim, so a cap-resting cylinder is
  supported like MuJoCo's flat branch instead of by a single arbitrary
  rim point. The tangent basis uses the coordinate axis least aligned
  with the cylinder axis (never a zero cross product)."""
  n = m1[..., :, 2]
  axis = m2[..., :, 2]
  r, hl = s2[..., 0], s2[..., 1]
  # rim direction in the cap plane most opposed to the plane normal
  d = -(n - axis * jnp.sum(n * axis, axis=-1, keepdims=True))
  dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
  # robust tangent basis: reference axis least aligned with `axis`
  xhat = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], p2.dtype),
                          axis.shape)
  yhat = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], p2.dtype),
                          axis.shape)
  ref = jnp.where(jnp.abs(axis[..., 0:1]) > 0.5, yhat, xhat)
  a1 = math.normalize(jnp.cross(axis, ref))
  a2 = jnp.cross(axis, a1)
  deg = dn <= 1e-8
  d = jnp.where(~deg, d / jnp.maximum(dn, 1e-12), a1)
  rim1 = p2 + axis * hl[..., None] + d * r[..., None]
  rim2 = p2 - axis * hl[..., None] + d * r[..., None]
  pts = jnp.stack([rim1, rim2, 0.5 * (rim1 + rim2)], axis=-2)   # (S,3,3)
  # flat-resting: 120°-spread support triangle on the deep cap
  sgn = jnp.sign(jnp.sum(axis * n, axis=-1, keepdims=True))
  sgn = jnp.where(sgn == 0.0, 1.0, sgn)
  cdeep = p2 - sgn * axis * hl[..., None]
  rr = r[..., None]
  f0 = cdeep + rr * a1
  f1 = cdeep + rr * (-0.5 * a1 + (np.sqrt(3.0) / 2.0) * a2)
  f2 = cdeep + rr * (-0.5 * a1 - (np.sqrt(3.0) / 2.0) * a2)
  flat = jnp.stack([f0, f1, f2], axis=-2)
  pts = jnp.where(deg[..., None], flat, pts)
  cdist = jnp.sum(n[..., None, :] * (pts - p1[..., None, :]), axis=-1)
  pos = pts - 0.5 * cdist[..., None] * n[..., None, :]
  nrm = jnp.broadcast_to(n[..., None, :], pos.shape)
  return cdist, pos, nrm, None


_DISPATCH = {
    (int(GeomType.PLANE), int(GeomType.SPHERE)): _plane_sphere,
    (int(GeomType.PLANE), int(GeomType.CAPSULE)): _plane_capsule,
    (int(GeomType.PLANE), int(GeomType.ELLIPSOID)): _plane_ellipsoid,
    (int(GeomType.PLANE), int(GeomType.CYLINDER)): _plane_cylinder,
    (int(GeomType.PLANE), int(GeomType.BOX)): _plane_box,
    (int(GeomType.SPHERE), int(GeomType.SPHERE)): _sphere_sphere,
    (int(GeomType.SPHERE), int(GeomType.CAPSULE)): _sphere_capsule,
    (int(GeomType.SPHERE), int(GeomType.ELLIPSOID)): _sphere_ellipsoid,
    (int(GeomType.SPHERE), int(GeomType.BOX)): _sphere_box,
    (int(GeomType.CAPSULE), int(GeomType.CAPSULE)): _capsule_capsule,
    (int(GeomType.CAPSULE), int(GeomType.ELLIPSOID)): _capsule_ellipsoid,
    (int(GeomType.CAPSULE), int(GeomType.BOX)): _capsule_box,
    (int(GeomType.ELLIPSOID), int(GeomType.ELLIPSOID)): _ellipsoid_ellipsoid,
    (int(GeomType.ELLIPSOID), int(GeomType.BOX)): _ellipsoid_box,
    (int(GeomType.BOX), int(GeomType.BOX)): _box_box,
}


def collision(m: Model, d: Data) -> Data:
  """Evaluate all contact slots; fill d.contact (fixed layout)."""
  if not m.contact_slots:
    return d
  dt = d.qpos.dtype
  ncon = m.ncon_max

  # group slot indices by type pair, remember output offsets
  groups: Dict[Tuple[int, int], List[int]] = {}
  offsets = []
  off = 0
  for k, s in enumerate(m.contact_slots):
    groups.setdefault((s.type1, s.type2), []).append(k)
    offsets.append(off)
    off += s.max_points

  dist_out = jnp.full((ncon,), 1e10, dt)
  pos_out = jnp.zeros((ncon, 3), dt)
  frame_out = jnp.broadcast_to(jnp.eye(3, dtype=dt), (ncon, 3, 3))

  size = _cast_np(m.geom_size, dt)

  for (t1, t2), idxs in groups.items():
    fn = _DISPATCH.get((t1, t2))
    if fn is None:
      raise NotImplementedError(
          f"narrowphase ({GeomType(t1).name},{GeomType(t2).name})")
    g1 = np.array([m.contact_slots[k].geom1 for k in idxs])
    g2 = np.array([m.contact_slots[k].geom2 for k in idxs])
    dist, pos, nrm, hint = fn(d.geom_xpos[g1], d.geom_xmat[g1], size[g1],
                              d.geom_xpos[g2], d.geom_xmat[g2], size[g2])
    frame = make_frame(nrm, hint)                     # (S, P, 3, 3)
    # scatter into the flat contact arrays
    flat_idx = np.concatenate([
        np.arange(offsets[k], offsets[k] + m.contact_slots[k].max_points)
        for k in idxs])
    P = dist.shape[-1]
    dist_out = dist_out.at[flat_idx].set(dist.reshape(-1))
    pos_out = pos_out.at[flat_idx].set(pos.reshape(-1, 3))
    frame_out = frame_out.at[flat_idx].set(frame.reshape(-1, 3, 3))

  return d.replace(contact=Contact(dist=dist_out, pos=pos_out,
                                   frame=frame_out))


def _cast_np(x, dtype):
  return jnp.asarray(x, dtype)
