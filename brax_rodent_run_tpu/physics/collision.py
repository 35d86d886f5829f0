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


_DISPATCH = {
    (int(GeomType.PLANE), int(GeomType.SPHERE)): _plane_sphere,
    (int(GeomType.PLANE), int(GeomType.CAPSULE)): _plane_capsule,
    (int(GeomType.PLANE), int(GeomType.ELLIPSOID)): _plane_ellipsoid,
    (int(GeomType.PLANE), int(GeomType.BOX)): _plane_box,
    (int(GeomType.SPHERE), int(GeomType.SPHERE)): _sphere_sphere,
    (int(GeomType.SPHERE), int(GeomType.CAPSULE)): _sphere_capsule,
    (int(GeomType.CAPSULE), int(GeomType.CAPSULE)): _capsule_capsule,
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
