"""Model rescaling for mocap preprocessing.

The reference rescales the rodent MJCF by 0.9 through the dm_control DOM +
recompile (preprocessing/mjx_preprocess.py:75-83). We rescale the compiled
Model directly: all kinematic offsets and geom/site sizes scale linearly.
The mocap pipeline only runs forward KINEMATICS on the rescaled model, so
mass/inertia rescaling is irrelevant for clip features; we still rescale
masses/inertias physically (m ~ s^3, I ~ s^5) so the model stays usable for
dynamics.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from brax_rodent_run_tpu.physics.types import Model


def _explicit_jnt_pos_mask(m: Model, xml_path: str) -> np.ndarray:
  """Which joints carry an explicit per-element ``pos`` attribute.

  dm_control's ``rescale_subtree`` (the reference's rescale,
  mjx_preprocess.py:78-82) walks the MJCF DOM and scales only attributes
  set on the element itself — joint positions inherited from a defaults
  class are silently left UNSCALED. We replicate that behavior for
  parity: rodent_new.xml sets every joint pos via defaults classes
  (e.g. :47,:61), so the reference's rescaled model keeps them
  unscaled."""
  import xml.etree.ElementTree as ET
  root = ET.parse(xml_path).getroot()
  wb = root.find("worldbody")
  # by-name lookup (joint ids follow BODY preorder, not raw document
  # order — e.g. the rodent tail puts a body's own joint after its child
  # bodies textually); unnamed joints fall back to body-preorder count.
  by_name = {}
  ordered = []

  def visit(body):
    for el in list(body):
      if el.tag in ("joint", "freejoint"):
        has = el.tag == "joint" and "pos" in el.attrib
        ordered.append(has)
        if "name" in el.attrib:
          by_name[el.attrib["name"]] = has
    for el in list(body):
      if el.tag == "body":
        visit(el)

  if wb is not None:
    visit(wb)
  if len(ordered) != m.njnt:
    # structure didn't line up (replicate etc.) — scale everything
    return np.ones(m.njnt, bool)
  mask = np.asarray(ordered, bool)
  for j, name in enumerate(m.joint_names):
    if name in by_name:
      mask[j] = by_name[name]
  return mask


def rescale_model(m: Model, scale: float,
                  rescale_inertia: bool = True,
                  xml_path: str | None = None) -> Model:
  s = float(scale)
  if xml_path is not None:
    jmask = _explicit_jnt_pos_mask(m, xml_path)
    jnt_pos = np.where(jmask[:, None], m.jnt_pos * s, m.jnt_pos)
  else:
    jnt_pos = m.jnt_pos * s
  updates = dict(
      body_pos=m.body_pos * s,
      body_ipos=m.body_ipos * s,
      jnt_pos=jnt_pos,
      geom_pos=m.geom_pos * s,
      geom_size=m.geom_size * s,
      site_pos=m.site_pos * s,
      site_size=m.site_size * s,
      qpos0=_scale_qpos(m, m.qpos0, s),
      qpos_spring=_scale_qpos(m, m.qpos_spring, s),
  )
  if rescale_inertia:
    updates.update(
        body_mass=m.body_mass * s ** 3,
        body_subtreemass=m.body_subtreemass * s ** 3,
        body_inertia=m.body_inertia * s ** 5,
    )
  return m.replace(**updates)


def _scale_qpos(m: Model, qpos: np.ndarray, s: float) -> np.ndarray:
  """Scale only free-joint translations inside a qpos-like vector."""
  from brax_rodent_run_tpu.physics.types import JointType
  out = qpos.copy()
  for j in range(m.njnt):
    if m.jnt_type[j] == JointType.FREE:
      adr = int(m.jnt_qposadr[j])
      out[adr:adr + 3] *= s
  return out
