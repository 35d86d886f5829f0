"""Constraint-row + solver parity vs the MuJoCo C oracle (BASELINE config 1).

Row-by-row efc comparison (J, D, aref, pos) with rows matched via MuJoCo's
efc_type/efc_id metadata, then end-to-end qacc / qfrc_constraint comparison
with both solvers run to convergence (warmstart disabled on both sides).
"""

import mujoco
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model
from brax_rodent_run_tpu.physics import forward
from brax_rodent_run_tpu.physics.constraint import dense_efc_J, efc_layout
from brax_rodent_run_tpu.physics.types import make_data

MODELS = ["humanoid.xml", "rodent_new.xml"]


def _near_ground(mj_model, seed, drop=0.05):
  rng = np.random.RandomState(seed)
  mjd = mujoco.MjData(mj_model)
  q = mj_model.qpos0.copy() + rng.uniform(-0.05, 0.05, mj_model.nq)
  for j in range(mj_model.njnt):
    if mj_model.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      adr = mj_model.jnt_qposadr[j]
      q[adr + 2] = drop
      q[adr + 3:adr + 7] /= np.linalg.norm(q[adr + 3:adr + 7])
  mjd.qpos[:] = q
  mjd.qvel[:] = rng.uniform(-0.5, 0.5, mj_model.nv)
  if mj_model.na:
    mjd.act[:] = rng.uniform(-0.2, 0.2, mj_model.na)
  mjd.ctrl[:] = rng.uniform(-1, 1, mj_model.nu)
  return mjd


def _ours_forward(m, mjd):
  d = make_data(m, dtype=jnp.float64)
  d = d.replace(qpos=jnp.array(mjd.qpos), qvel=jnp.array(mjd.qvel),
                act=jnp.array(mjd.act), ctrl=jnp.array(mjd.ctrl))
  return forward.forward(m, d)


def _load(name, solver="cg", iterations=100, ls_iterations=50):
  mj_model = mujoco.MjModel.from_xml_path(model_path(name))
  mj_model.opt.jacobian = 0
  mj_model.opt.solver = {"cg": mujoco.mjtSolver.mjSOL_CG,
                         "newton": mujoco.mjtSolver.mjSOL_NEWTON}[solver]
  mj_model.opt.iterations = iterations
  mj_model.opt.ls_iterations = ls_iterations
  # disable warmstart so both sides start from qacc_smooth
  mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  m = from_mj_model(mj_model)
  return mj_model, m


def _match_rows(mj_model, mjd, m):
  """Return list of (mj_row, our_row) index pairs."""
  lay = efc_layout(m)
  pairs = []
  # map contact (slot order) to our point index: our contact points are laid
  # out slot-by-slot; find our point whose pos matches mujoco's contact
  import brax_rodent_run_tpu  # noqa
  # our per-point row offsets
  point_rows = []  # point -> (first row, nrows)
  off = lay.nlimit
  npoints = int(lay.con_id.max()) + 1 if lay.ncon_rows else 0
  rows_of_point = {}
  for r in range(lay.ncon_rows):
    rows_of_point.setdefault(int(lay.con_id[r]), []).append(lay.nlimit + r)

  for i in range(mjd.nefc):
    t = mjd.efc_type[i]
    if t == mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT:
      jid = mjd.efc_id[i]
      dof = mj_model.jnt_dofadr[jid]
      # which side: sign of J
      Jrow = mjd.efc_J.reshape(mjd.nefc, mj_model.nv)[i]
      sign = np.sign(Jrow[dof])
      cand = [r for r in range(lay.nlimit)
              if lay.lim_dof[r] == dof and lay.lim_sign[r] == sign]
      assert len(cand) == 1
      pairs.append((i, cand[0]))
    elif t == mujoco.mjtConstraint.mjCNSTR_CONTACT_PYRAMIDAL:
      # contact id and row-within-contact
      cid = mjd.efc_id[i]
      adr = mjd.contact.efc_address[cid]
      within = i - adr
      # find our point with matching position
      cpos = mjd.contact.pos[cid]
      best, bestd = None, 1e9
      d = _ours_forward.last  # set below
      for p, rows in rows_of_point.items():
        dd = np.linalg.norm(np.asarray(d.contact.pos)[p] - cpos)
        if dd < bestd:
          bestd, best = dd, p
      assert bestd < 1e-8, f"no matching contact point ({bestd})"
      pairs.append((i, rows_of_point[best][within]))
    else:
      raise AssertionError(f"unexpected efc type {t}")
  return pairs


@pytest.mark.parametrize("name", MODELS)
def test_efc_rows(name):
  mj_model, m = _load(name)
  for seed in range(3):
    mjd = _near_ground(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)
    d = _ours_forward(m, mjd)
    _ours_forward.last = d
    if not mjd.nefc:
      continue
    Jmj = mjd.efc_J.reshape(mjd.nefc, mj_model.nv)
    ours_J = np.asarray(dense_efc_J(m, d))
    for i, r in _match_rows(mj_model, mjd, m):
      np.testing.assert_allclose(ours_J[r], Jmj[i], atol=1e-8,
                                 err_msg=f"{name} row {i}->{r} J")
      np.testing.assert_allclose(np.asarray(d.efc_pos)[r], mjd.efc_pos[i],
                                 atol=1e-9, err_msg=f"row {i} pos")
      np.testing.assert_allclose(np.asarray(d.efc_D)[r], mjd.efc_D[i],
                                 rtol=1e-6, err_msg=f"row {i} D")
      np.testing.assert_allclose(np.asarray(d.efc_aref)[r], mjd.efc_aref[i],
                                 rtol=1e-6, atol=1e-8,
                                 err_msg=f"row {i} aref")


_ANISO_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1"/>
    <body name="ball" pos="0 0 0.04">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.05" density="1000"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="ball" condim="3"
          friction="1.0 0.4 0.005 0.0001 0.0001"/>
  </contact>
</mujoco>
"""


def test_efc_D_anisotropic_friction():
  """Pyramid diagApprox uses friction[0] for EVERY row (MuJoCo semantics),
  even when the second sliding direction has a different mu. A
  per-direction-mu diag would put the mu=0.4 rows' efc_D off by
  (1.0/0.4)^2 ~ 6x vs the oracle (ADVICE r2, medium)."""
  mj_model = mujoco.MjModel.from_xml_string(_ANISO_XML)
  mj_model.opt.jacobian = 0
  mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
  m = from_mj_model(mj_model)
  mjd = mujoco.MjData(mj_model)
  mjd.qpos[2] = 0.045          # penetrating: contact active
  mjd.qvel[:] = [0.3, -0.2, 0.0, 0.1, 0.2, 0.05]
  mujoco.mj_forward(mj_model, mjd)
  assert mjd.nefc == 4          # 2*(condim-1) pyramid rows
  d = _ours_forward(m, mjd)
  _ours_forward.last = d
  for i, r in _match_rows(mj_model, mjd, m):
    np.testing.assert_allclose(np.asarray(d.efc_D)[r], mjd.efc_D[i],
                               rtol=1e-6, err_msg=f"aniso row {i}->{r} D")
    Jmj = mjd.efc_J.reshape(mjd.nefc, mj_model.nv)
    ours_J = np.asarray(dense_efc_J(m, d))
    np.testing.assert_allclose(ours_J[r], Jmj[i], atol=1e-8,
                               err_msg=f"aniso row {i}->{r} J")


def test_condim_gt3_guarded():
  """condim>3 (torsional/rolling rows) is unsupported and must fail loudly
  at layout time, not compose garbage rows (ADVICE r2)."""
  xml = _ANISO_XML.replace('condim="3"', 'condim="4"')
  mj_model = mujoco.MjModel.from_xml_string(xml)
  m = from_mj_model(mj_model)
  with pytest.raises(NotImplementedError, match="condim=4"):
    efc_layout(m)


@pytest.mark.parametrize("name", MODELS)
@pytest.mark.parametrize("solver", ["cg", "newton"])
def test_qacc_converged(name, solver):
  """Both solvers at high iterations agree with mujoco's converged qacc."""
  mj_model, m = _load(name, solver=solver, iterations=100, ls_iterations=50)
  for seed in range(3):
    mjd = _near_ground(mj_model, seed)
    mujoco.mj_forward(mj_model, mjd)
    d = _ours_forward(m, mjd)
    scale = np.abs(mjd.qacc).max() + 1.0
    np.testing.assert_allclose(np.asarray(d.qacc) / scale,
                               mjd.qacc / scale, atol=2e-6,
                               err_msg=f"{name}/{solver}/seed{seed} qacc")
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint) / scale,
        mjd.qfrc_constraint / scale, atol=2e-6,
        err_msg=f"{name}/{solver} qfrc_constraint")
