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


def rescale_model(m: Model, scale: float,
                  rescale_inertia: bool = True) -> Model:
  s = float(scale)
  updates = dict(
      body_pos=m.body_pos * s,
      body_ipos=m.body_ipos * s,
      jnt_pos=m.jnt_pos * s,
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
