"""Quaternion + spatial (6D) algebra for the physics pipeline.

Conventions follow MuJoCo (the behavioral contract exercised by the reference
at Rodent_Env_Brax.py:41-60): quaternions are [w, x, y, z]; spatial motion and
force vectors are 6D with the ANGULAR part first ([omega; v] / [torque; force]).

Everything here is pure jax.numpy, shape-polymorphic over leading batch dims
where noted, and written to fuse cleanly under jit/vmap on TPU (no data
dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u*v for [w,x,y,z] quaternions (batch-broadcasting)."""
  w1, x1, y1, z1 = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  w2, x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array) -> jax.Array:
  """Conjugate (inverse for unit quaternions)."""
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate 3-vector v by unit quaternion q (body->world if q is body pose)."""
  # v' = v + 2*r x (r x v + w*v), r = q[1:4]
  r = q[..., 1:4]
  w = q[..., 0:1]
  t = 2.0 * jnp.cross(r, v)
  return v + w * t + jnp.cross(r, t)


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate v by q^{-1} (world->body)."""
  return quat_rot(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix (columns are body axes in world)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
          2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
          2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion [w,x,y,z], branch-free.

  Uses the stable 4-way formulation: compute all four candidate quaternions
  scaled by 4*q_i^2 and pick the one with the largest pivot via where-selects
  (no data-dependent control flow, vmap/TPU friendly).
  """
  m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
  m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
  m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
  tr = m00 + m11 + m22

  # Four candidates, each valid when its pivot is the max.
  qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
  qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
  qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
  qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

  pivots = jnp.stack(
      [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
       1.0 - m00 - m11 + m22], -1)
  best = jnp.argmax(pivots, axis=-1)
  cands = jnp.stack([qw, qx, qy, qz], -2)  # (..., 4 candidates, 4)
  q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                          .repeat(4, -1), axis=-2)[..., 0, :]
  q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
  # Canonical sign: w >= 0 (matches mju_mat2Quat normalization).
  return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrate unit quaternion by angular velocity omega (local frame) * dt.

  Matches mju_quatIntegrate: q' = q * exp([0, omega*dt/2]) with exact
  axis-angle exponential, then normalize.
  """
  angle = jnp.linalg.norm(omega, axis=-1, keepdims=True) * dt
  # Guard the 0/0; sin(x)/x -> 1.
  axis = omega / jnp.maximum(jnp.linalg.norm(omega, axis=-1, keepdims=True),
                             1e-12)
  half = 0.5 * angle
  dq = jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)
  out = quat_mul(q, dq)
  return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle -> quaternion."""
  half = 0.5 * angle[..., None]
  return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference: 3D rotation taking qb to qa (local frame).

  Matches mju_subQuat: returns log map of qb^{-1} * qa (axis * angle).
  """
  q = quat_mul(quat_conj(qb), qa)
  # Ensure shortest arc.
  q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
  sin_half = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
  angle = 2.0 * jnp.arctan2(sin_half, q[..., 0:1])
  axis = q[..., 1:4] / jnp.maximum(sin_half, 1e-12)
  return (axis * angle).reshape(q.shape[:-1] + (3,))


# ---------------------------------------------------------------------------
# Spatial (6D) algebra — MuJoCo layout: [angular(3); linear(3)]
# ---------------------------------------------------------------------------

def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: v x u (mju_crossMotion)."""
  ang = jnp.cross(v[..., :3], u[..., :3])
  lin = jnp.cross(v[..., :3], u[..., 3:]) + jnp.cross(v[..., 3:], u[..., :3])
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product motion x force: v x* f (mju_crossForce)."""
  ang = jnp.cross(v[..., :3], f[..., :3]) + jnp.cross(v[..., 3:], f[..., 3:])
  lin = jnp.cross(v[..., :3], f[..., 3:])
  return jnp.concatenate([ang, lin], axis=-1)


def transform_motion(vec: jax.Array, offset: jax.Array,
                     rotnew2old: jax.Array | None = None) -> jax.Array:
  """Translate (and optionally rotate) a spatial motion vector.

  Matches mju_transformSpatial(force=0): new frame origin is displaced by
  `offset` (newpos - oldpos expressed in old/world frame); `rotnew2old` is a
  3x3 matrix whose columns express the new frame axes in the old frame (i.e.
  v_new = R^T v_old).
  """
  ang = vec[..., :3]
  lin = vec[..., 3:] - jnp.cross(offset, ang)
  if rotnew2old is not None:
    ang = jnp.einsum('...ij,...j->...i', rotnew2old, ang)
    lin = jnp.einsum('...ij,...j->...i', rotnew2old, lin)
  return jnp.concatenate([ang, lin], axis=-1)


def transform_force(vec: jax.Array, offset: jax.Array,
                    rotnew2old: jax.Array | None = None) -> jax.Array:
  """Translate (and optionally rotate) a spatial force vector (force=1)."""
  lin = vec[..., 3:]
  ang = vec[..., :3] - jnp.cross(offset, lin)
  if rotnew2old is not None:
    ang = jnp.einsum('...ij,...j->...i', rotnew2old, ang)
    lin = jnp.einsum('...ij,...j->...i', rotnew2old, lin)
  return jnp.concatenate([ang, lin], axis=-1)


def inert_mul(cinert: jax.Array, vel: jax.Array) -> jax.Array:
  """Multiply a 10D compressed spatial inertia by a motion vector.

  cinert layout (mjData.cinert row): [Ixx Iyy Izz Ixy Ixz Iyz, mass*c(3), mass]
  where I is the inertia about the reference point and c is the vector from
  the reference point to the body CoM. Returns a spatial force [torque; force]:

    torque = I*w + c_m x v
    force  = m*v - c_m x w        (c_m = mass*c)
  """
  ixx, iyy, izz = cinert[..., 0], cinert[..., 1], cinert[..., 2]
  ixy, ixz, iyz = cinert[..., 3], cinert[..., 4], cinert[..., 5]
  cm = cinert[..., 6:9]
  mass = cinert[..., 9:10]
  w, v = vel[..., :3], vel[..., 3:]
  iw = jnp.stack(
      [
          ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
          ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
          ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
      ],
      axis=-1,
  )
  torque = iw + jnp.cross(cm, v)
  force = mass * v - jnp.cross(cm, w)
  return jnp.concatenate([torque, force], axis=-1)


def normalize_with_norm(v: jax.Array, axis: int = -1):
  n = jnp.linalg.norm(v, axis=axis, keepdims=True)
  return v / jnp.maximum(n, 1e-15), jnp.squeeze(n, axis)


def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
  return normalize_with_norm(v, axis)[0]
