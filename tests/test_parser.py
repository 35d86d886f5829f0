"""Native MJCF compiler parity: diff every compiled array vs mujoco.MjModel.

SURVEY.md §7 step 1 acceptance: "Validate by loading all 6 XMLs and
diffing sizes/qpos0/inertias against mujoco.MjModel". The humanoid also
covers degrees-mode angles, explicit pair/exclude contacts, keyframes,
and motor actuators; rodent_cpu covers fixed tendons + tendon actuators;
rodent_pair covers <replicate> expansion.
"""

import mujoco
import numpy as np
import pytest

from tests.conftest import model_path
from brax_rodent_run_tpu.mjcf import from_mj
from brax_rodent_run_tpu.mjcf import parser

MODELS = [
    "humanoid.xml",
    "rodent_new.xml",
    "rodent_optimized.xml",
    "rodent_0.xml",
    "rodent_cpu.xml",
    "rodent_pair.xml",
]

_SIZES = ("nq", "nv", "nu", "na", "nbody", "njnt", "ngeom", "nsite",
          "ntendon", "nwrap", "nsensor", "nsensordata", "nkey")

_EXACT_INT = (
    "body_parentid", "body_rootid", "body_weldid", "body_jntadr",
    "body_jntnum", "body_dofadr", "body_dofnum", "body_geomadr",
    "body_geomnum", "jnt_type", "jnt_qposadr", "jnt_dofadr", "jnt_bodyid",
    "dof_bodyid", "dof_jntid", "dof_parentid", "geom_type", "geom_bodyid",
    "geom_contype", "geom_conaffinity", "geom_condim", "geom_priority",
    "site_bodyid", "site_type", "tendon_adr", "tendon_num",
    "actuator_trntype", "actuator_dyntype", "actuator_gaintype",
    "actuator_biastype", "actuator_actadr", "actuator_actnum",
    "sensor_type", "sensor_objid", "sensor_adr", "sensor_dim",
    "wrap_jntid",
)

_BOOL = ("jnt_limited", "tendon_limited", "actuator_ctrllimited",
         "actuator_forcelimited")

_FLOAT = (
    "qpos0", "qpos_spring", "body_pos", "body_quat", "body_ipos",
    "body_mass", "body_subtreemass",
    "jnt_solref", "jnt_solimp", "jnt_pos", "jnt_axis", "jnt_stiffness",
    "jnt_range", "jnt_margin",
    "dof_armature", "dof_damping", "dof_frictionloss",
    "geom_solmix", "geom_solref", "geom_solimp", "geom_size", "geom_pos",
    "geom_friction", "geom_margin", "geom_gap",
    "site_pos", "site_size",
    "tendon_range", "tendon_solref_lim", "tendon_solimp_lim",
    "tendon_stiffness", "tendon_damping", "tendon_lengthspring",
    "tendon_length0", "wrap_coef",
    "actuator_dynprm", "actuator_gainprm", "actuator_biasprm",
    "actuator_ctrlrange", "actuator_forcerange", "actuator_gear",
    "key_qpos",
)

# derived via our own CRB at qpos0 — slightly looser
_DERIVED = ("body_invweight0", "dof_invweight0", "tendon_invweight0",
            "actuator_acc0")


def quat_close(a, b, tol=1e-8):
  a = np.asarray(a)
  b = np.asarray(b)
  return (np.abs(a - b).max(axis=-1) < tol) | \
         (np.abs(a + b).max(axis=-1) < tol)


@pytest.mark.parametrize("name", MODELS)
def test_parser_matches_mujoco(name):
  path = model_path(name)
  mj = mujoco.MjModel.from_xml_path(path)
  ref = from_mj.from_mj_model(mj)
  ours = parser.load_xml(path)

  errs = []
  for s in _SIZES:
    if getattr(ours, s) != getattr(ref, s):
      errs.append(f"{s}: ours={getattr(ours, s)} ref={getattr(ref, s)}")
  assert not errs, errs

  for f in _EXACT_INT + _BOOL:
    a, b = getattr(ours, f), getattr(ref, f)
    if not np.array_equal(a, b):
      bad = np.where(np.asarray(a) != np.asarray(b))[0][:5]
      errs.append(f"{f}: mismatch at {bad} ours={np.asarray(a)[bad]} "
                  f"ref={np.asarray(b)[bad]}")
  assert not errs, "\n".join(errs)

  for f in _FLOAT:
    a, b = np.asarray(getattr(ours, f)), np.asarray(getattr(ref, f))
    if a.shape != b.shape:
      errs.append(f"{f}: shape {a.shape} vs {b.shape}")
      continue
    if a.size and not np.allclose(a, b, atol=1e-8, rtol=1e-6):
      d = np.abs(a - b)
      errs.append(f"{f}: max abs err {d.max()} at {np.unravel_index(d.argmax(), d.shape)}")
  assert not errs, "\n".join(errs)

  # quaternions match up to sign
  for f in ("geom_quat", "site_quat"):
    a, b = np.asarray(getattr(ours, f)), np.asarray(getattr(ref, f))
    ok = quat_close(a, b, tol=1e-6)
    if not np.all(ok):
      bad = np.where(~ok)[0][:5]
      errs.append(f"{f}: quat mismatch rows {bad}: ours={a[bad]} ref={b[bad]}")
  assert not errs, "\n".join(errs)

  # body inertial frame: (iquat, diag inertia) pairs are only defined up
  # to principal-axis permutation when eigenvalues repeat — compare the
  # reconstructed 3x3 tensors instead of raw arrays
  def tensors(model):
    out = np.zeros((model.nbody, 3, 3))
    for b in range(model.nbody):
      w, x, y, z = model.body_iquat[b]
      R = np.array([
          [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
          [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
          [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
      ])
      out[b] = R @ np.diag(model.body_inertia[b]) @ R.T
    return out

  np.testing.assert_allclose(tensors(ours), tensors(ref),
                             atol=1e-10, rtol=1e-6,
                             err_msg="body inertia tensor mismatch")

  for f in _DERIVED:
    a, b = np.asarray(getattr(ours, f)), np.asarray(getattr(ref, f))
    if a.size and not np.allclose(a, b, atol=1e-6, rtol=1e-4):
      d = np.abs(a - b)
      errs.append(f"{f}: max abs err {d.max()}")
  assert not errs, "\n".join(errs)

  # contact slot tables identical
  assert len(ours.contact_slots) == len(ref.contact_slots), (
      len(ours.contact_slots), len(ref.contact_slots))
  for i, (so, sr) in enumerate(zip(ours.contact_slots, ref.contact_slots)):
    assert (so.geom1, so.geom2, so.type1, so.type2, so.max_points,
            so.condim) == (sr.geom1, sr.geom2, sr.type1, sr.type2,
                           sr.max_points, sr.condim), (i, so, sr)
    np.testing.assert_allclose(so.friction, sr.friction, atol=1e-10)
    np.testing.assert_allclose(so.solref, sr.solref, atol=1e-10)
    np.testing.assert_allclose(so.solimp, sr.solimp, atol=1e-10)
    assert abs(so.margin - sr.margin) < 1e-12
    assert abs(so.gap - sr.gap) < 1e-12

  # option parity
  assert ours.opt.timestep == pytest.approx(ref.opt.timestep)
  assert tuple(ours.opt.gravity) == pytest.approx(tuple(ref.opt.gravity))
  assert int(ours.opt.solver) == int(ref.opt.solver)
  assert ours.opt.iterations == ref.opt.iterations
  assert ours.opt.ls_iterations == ref.opt.ls_iterations
  assert ours.opt.disableflags == ref.opt.disableflags


def test_native_load_steps_without_mujoco():
  """The parser-built model drives the physics end to end (no MuJoCo in
  the loop): humanoid drops onto the floor and settles, all finite."""
  import jax
  import jax.numpy as jnp
  from brax_rodent_run_tpu.physics import forward
  from brax_rodent_run_tpu.physics.types import make_data

  m = parser.load_xml(model_path("humanoid.xml"), solver="newton",
                      iterations=20, ls_iterations=10)
  d = make_data(m, dtype=jnp.float64)
  step = jax.jit(lambda d: forward.step(m, d, jnp.zeros(m.nu)))
  for _ in range(20):
    d = step(d)
  assert np.all(np.isfinite(np.asarray(d.qpos)))
  assert float(d.qpos[2]) > 0.2     # torso stays above ground
