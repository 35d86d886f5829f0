"""Narrowphase parity vs the MuJoCo C oracle.

For randomized near-ground states of each model, every contact MuJoCo
reports must appear in our fixed-slot contact set with matching dist/pos/
frame; our extra (non-penetrating) slots must be inactive.
"""

import mujoco
import numpy as np
import pytest

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import collision, smooth
from brax_rodent_run_tpu.physics.types import make_data

import jax
import jax.numpy as jnp

MODELS = ["humanoid.xml", "rodent_new.xml", "rodent_optimized.xml"]


def _near_ground_state(mj_model, seed):
  rng = np.random.RandomState(seed)
  mjd = mujoco.MjData(mj_model)
  qpos = mj_model.qpos0.copy()
  qpos += rng.uniform(-0.05, 0.05, mj_model.nq)
  for j in range(mj_model.njnt):
    if mj_model.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      adr = mj_model.jnt_qposadr[j]
      qpos[adr + 2] = rng.uniform(0.0, 0.08)  # drop near the floor
      q = qpos[adr + 3:adr + 7]
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
  mjd.qpos[:] = qpos
  return mjd


def _slot_rows(m):
  """Map (geom1, geom2) -> list of flat contact row indices."""
  rows = {}
  off = 0
  for s in m.contact_slots:
    rows.setdefault((s.geom1, s.geom2), []).extend(
        range(off, off + s.max_points))
    off += s.max_points
  return rows


@pytest.mark.parametrize("name", MODELS)
def test_contacts_match(name):
  mj_model = mujoco.MjModel.from_xml_path(model_path(name))
  m = from_mj_model(mj_model)
  rows_by_pair = _slot_rows(m)

  total_mj_contacts = 0
  for seed in range(5):
    mjd = _near_ground_state(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)

    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=jnp.array(mjd.qpos))
    d = smooth.kinematics(m, d)
    d = collision.collision(m, d)
    dist = np.asarray(d.contact.dist)
    pos = np.asarray(d.contact.pos)
    frame = np.asarray(d.contact.frame)

    total_mj_contacts += mjd.ncon
    for c in range(mjd.ncon):
      g1, g2 = int(mjd.contact.geom1[c]), int(mjd.contact.geom2[c])
      key = (g1, g2) if (g1, g2) in rows_by_pair else (g2, g1)
      assert key in rows_by_pair, f"mujoco contact {g1},{g2} has no slot"
      cand = rows_by_pair[key]
      # find our row with closest dist+pos
      errs = [abs(dist[r] - mjd.contact.dist[c])
              + np.linalg.norm(pos[r] - mjd.contact.pos[c]) for r in cand]
      r = cand[int(np.argmin(errs))]
      assert abs(dist[r] - mjd.contact.dist[c]) < 1e-9, (
          name, seed, g1, g2, dist[cand], mjd.contact.dist[c])
      np.testing.assert_allclose(pos[r], mjd.contact.pos[c], atol=1e-9)
      mj_frame = mjd.contact.frame[c].reshape(3, 3)
      np.testing.assert_allclose(frame[r][0], mj_frame[0], atol=1e-9)
      # tangents: ours must be orthonormal and span the same plane
      np.testing.assert_allclose(frame[r] @ frame[r].T, np.eye(3), atol=1e-9)

    # every penetrating row of ours must be known to mujoco
    mj_pairs = {(int(mjd.contact.geom1[c]), int(mjd.contact.geom2[c]))
                for c in range(mjd.ncon)}
    mj_pairs |= {(b, a) for a, b in mj_pairs}
    off = 0
    for s in m.contact_slots:
      for r in range(off, off + s.max_points):
        if dist[r] < 0:
          assert (s.geom1, s.geom2) in mj_pairs, (
              f"we report penetration mujoco doesn't: {s.geom1},{s.geom2} "
              f"dist={dist[r]}")
      off += s.max_points
  assert total_mj_contacts > 0, "test states produced no contacts"


def test_plane_cylinder_flat_resting_support():
  """A cylinder resting on its cap (axis || plane normal) must be
  supported by three equal-depth rim points — not one arbitrary point —
  and the axis||x degenerate cross product must not produce NaNs."""
  import mujoco
  from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
  from brax_rodent_run_tpu.physics import collision as coll
  from brax_rodent_run_tpu.physics.types import make_data

  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="0 0 1"/>
      <body name="c" pos="0 0 0.095">
        <freejoint/>
        <geom name="cyl" type="cylinder" size="0.05 0.1" density="500"/>
      </body>
    </worldbody>
  </mujoco>
  """
  mj = mujoco.MjModel.from_xml_string(xml)
  mj.opt.jacobian = 0
  m = from_mj_model(mj)
  from brax_rodent_run_tpu.physics import smooth
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.asarray(m.qpos0, jnp.float64))
  d = jax.jit(lambda dd: coll.collision(m, smooth.kinematics(m, dd)))(d)
  dist = np.asarray(d.contact.dist)
  pos = np.asarray(d.contact.pos)
  active = dist < 0.0
  assert active.sum() == 3, (dist, active)
  np.testing.assert_allclose(dist[active], dist[active][0], atol=1e-12)
  assert np.all(np.isfinite(pos[active]))
  # the three support points are spread around the rim, not collapsed
  xy = pos[active][:, :2]
  spread = np.linalg.norm(xy - xy.mean(0), axis=1)
  assert np.all(spread > 0.04), xy

  # axis || x-hat (cross with x-hat degenerate): rotate the cylinder
  # to lie on its side along x — must stay finite with active contacts
  quat = np.array([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
  qpos = np.asarray(m.qpos0).copy()
  qpos[2] = 0.045
  qpos[3:7] = quat
  d2 = make_data(m, dtype=jnp.float64)
  d2 = d2.replace(qpos=jnp.asarray(qpos, jnp.float64))
  d2 = jax.jit(lambda dd: coll.collision(m, smooth.kinematics(m, dd)))(d2)
  assert np.all(np.isfinite(np.asarray(d2.contact.pos)))
  assert (np.asarray(d2.contact.dist) < 0).any()
