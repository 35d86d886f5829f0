"""Convex-pair narrowphase checks vs the MuJoCo C oracle.

MuJoCo routes non-plane ellipsoid pairs through libccd MPR
(engine_collision_convex.c), which is iterative and only activates on
penetration; our analytic/fixed-iteration narrowphases must agree on the
ACTIVATION DECISION (sign of dist) everywhere and on dist/pos to MPR
accuracy when penetrating. Sphere-box is analytic in both and compared
tightly. These pairs are what `rodent_cpu.xml` (BASELINE config 1) needs:
capsule-ellipsoid, sphere-ellipsoid, ellipsoid-ellipsoid, sphere-box,
capsule-box (rodent_cpu.xml:477-560 region's body geoms).
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import collision, smooth
from brax_rodent_run_tpu.physics.types import make_data

_PAIR_XML = """
<mujoco>
  <worldbody>
    <body name="b1" pos="0 0 0">
      <freejoint/>
      <geom name="g1" type="{t1}" size="{s1}" {e1}/>
    </body>
    <body name="b2" pos="0 0 0.5">
      <freejoint/>
      <geom name="g2" type="{t2}" size="{s2}" {e2}/>
    </body>
  </worldbody>
</mujoco>
"""


def _build(t1, s1, t2, s2):
  xml = _PAIR_XML.format(t1=t1, s1=s1, t2=t2, s2=s2, e1="", e2="")
  mj = mujoco.MjModel.from_xml_string(xml)
  return mj, from_mj_model(mj)


def _rand_pose(rng, spread):
  pos = rng.uniform(-spread, spread, 3)
  quat = rng.normal(size=4)
  quat /= np.linalg.norm(quat)
  return pos, quat


def _compare(mj, m, seeds, spread, dist_tol, pos_tol, require_hits=True):
  mjd = mujoco.MjData(mj)
  hits = 0
  for seed in seeds:
    rng = np.random.RandomState(seed)
    p1, q1 = _rand_pose(rng, spread)
    p2, q2 = _rand_pose(rng, spread)
    mjd.qpos[:] = np.concatenate([p1, q1, p2, q2])
    mujoco.mj_forward(mj, mjd)

    d = make_data(m, dtype=jnp.float64)
    d = d.replace(qpos=jnp.array(mjd.qpos))
    d = smooth.kinematics(m, d)
    d = collision.collision(m, d)
    dist = np.asarray(d.contact.dist)
    pos = np.asarray(d.contact.pos)

    if mjd.ncon:
      hits += 1
      mj_best = float(np.min(mjd.contact.dist[:mjd.ncon]))
      ours = float(np.min(dist))
      # activation decision must agree everywhere
      assert ours < dist_tol, (seed, ours, mj_best)
      # depth/pos compared only for SHALLOW contact: on deep overlap
      # MPR's minimal-translation depth and our surface-distance metric
      # legitimately diverge (the solver saturates either way)
      if abs(mj_best) < 0.04:
        assert abs(ours - mj_best) < dist_tol, (seed, ours, mj_best)
        k = int(np.argmin(mjd.contact.dist[:mjd.ncon]))
        r = int(np.argmin(dist))
        assert np.linalg.norm(pos[r] - mjd.contact.pos[k]) < pos_tol, (
            seed, pos[r], mjd.contact.pos[k])
    else:
      # mujoco says separated -> we must not report meaningful penetration
      assert float(np.min(dist)) > -dist_tol, (seed, float(np.min(dist)))
  if require_hits:
    assert hits > 0, "no contact cases generated — widen spread"


@pytest.mark.parametrize("t1,s1,t2,s2,spread,dtol,ptol", [
    ("sphere", "0.1", "ellipsoid", "0.15 0.1 0.25", 0.25, 2e-3, 2e-2),
    ("capsule", "0.06 0.12", "ellipsoid", "0.15 0.1 0.25", 0.3, 3e-3, 3e-2),
    ("ellipsoid", "0.12 0.2 0.1", "ellipsoid", "0.15 0.1 0.25", 0.3,
     5e-3, 5e-2),
    ("sphere", "0.1", "box", "0.15 0.1 0.2", 0.25, 1e-6, 1e-6),
    ("capsule", "0.06 0.12", "box", "0.15 0.1 0.2", 0.3, 5e-3, 6e-2),
    ("ellipsoid", "0.12 0.2 0.1", "box", "0.15 0.1 0.2", 0.3, 8e-3, 8e-2),
    ("box", "0.1 0.15 0.2", "box", "0.15 0.1 0.2", 0.3, 2e-2, 1e-1),
])
def test_convex_pair_vs_mujoco(t1, s1, t2, s2, spread, dtol, ptol):
  mj, m = _build(t1, s1, t2, s2)
  _compare(mj, m, seeds=range(40), spread=spread, dist_tol=dtol,
           pos_tol=ptol)


def test_separated_pairs_inactive():
  """Well-separated convex pairs must report dist > 0 (slot masked)."""
  for t1, s1, t2, s2 in [
      ("sphere", "0.1", "ellipsoid", "0.15 0.1 0.25"),
      ("capsule", "0.06 0.12", "ellipsoid", "0.15 0.1 0.25"),
      ("ellipsoid", "0.12 0.2 0.1", "ellipsoid", "0.15 0.1 0.25"),
      ("sphere", "0.1", "box", "0.15 0.1 0.2"),
      ("capsule", "0.06 0.12", "box", "0.15 0.1 0.2"),
      ("ellipsoid", "0.12 0.2 0.1", "box", "0.15 0.1 0.2"),
      ("box", "0.1 0.15 0.2", "box", "0.15 0.1 0.2"),
  ]:
    mj, m = _build(t1, s1, t2, s2)
    d = make_data(m, dtype=jnp.float64)
    qpos = np.zeros(m.nq)
    qpos[3] = 1.0
    qpos[7:10] = [2.0, 0.0, 0.0]      # 2 m apart
    qpos[10] = 1.0
    d = d.replace(qpos=jnp.array(qpos))
    d = smooth.kinematics(m, d)
    d = collision.collision(m, d)
    assert float(np.min(np.asarray(d.contact.dist))) > 0.5, (t1, t2)
