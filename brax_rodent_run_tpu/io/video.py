"""Host-side qpos -> video rendering for eval callbacks.

Rebuilds the reference's render path (brax_rodent_run_ppo.py:169-197 and
render_rollout.ipynb cell 9): device rollouts come back as qpos
trajectories; a CPU MuJoCo model + Renderer (EGL/OSMesa) turns them into
mp4. The side-by-side eval uses the two-walker pair model
(models/rodent_pair.xml, <replicate count="2">): first walker plays the
reference clip, second plays the policy rollout.

Rendering is optional: if no GL backend is available the functions
raise ``RenderUnavailable`` and callers skip video (training never
depends on it).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


class RenderUnavailable(RuntimeError):
  pass


def _make_renderer(mj_model, width: int, height: int):
  os.environ.setdefault("MUJOCO_GL", "egl")
  import mujoco
  try:
    return mujoco.Renderer(mj_model, height=height, width=width)
  except Exception as e:  # no GL context in this process
    raise RenderUnavailable(str(e)) from e


def render_qpos_trajectory(
    mj_model,
    qposes: np.ndarray,
    out_path: str,
    fps: float = 50.0,
    camera: Optional[str] = None,
    size: Sequence[int] = (512, 512),
) -> str:
  """Render a (T, nq) qpos trajectory with mj_forward per frame -> mp4."""
  import imageio
  import mujoco

  renderer = _make_renderer(mj_model, size[0], size[1])
  mj_data = mujoco.MjData(mj_model)
  os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
  frames = []
  for qpos in qposes:
    mj_data.qpos[:] = qpos
    mujoco.mj_forward(mj_model, mj_data)
    renderer.update_scene(
        mj_data, camera=camera if camera is not None else -1)
    frames.append(renderer.render())
  renderer.close()
  try:
    imageio.mimwrite(out_path, frames, fps=fps)
  except Exception:
    # no mp4 backend (ffmpeg) in this environment: fall back to GIF
    out_path = os.path.splitext(out_path)[0] + ".gif"
    imageio.mimwrite(out_path, frames, fps=fps)
  return out_path


def render_pair_eval(
    pair_xml_path: str,
    ref_qposes: np.ndarray,
    rollout_qposes: np.ndarray,
    out_path: str,
    fps: float = 50.0,
    camera: Optional[str] = "close_profile",
    size: Sequence[int] = (512, 512),
    solver_iterations: int = 6,
    ls_iterations: int = 6,
) -> str:
  """Side-by-side reference-clip vs policy video on the pair model.

  Mirrors policy_params_fn: pair model configured CG 6/6
  (brax_rodent_run_ppo.py:169-177), per-frame qpos = ref ++ rollout,
  length = min of the two (the reference zip truncates to 250 frames)."""
  import mujoco

  mj_model = mujoco.MjModel.from_xml_path(pair_xml_path)
  mj_model.opt.solver = mujoco.mjtSolver.mjSOL_CG
  mj_model.opt.iterations = solver_iterations
  mj_model.opt.ls_iterations = ls_iterations

  T = min(len(ref_qposes), len(rollout_qposes))
  nq_single = ref_qposes.shape[1]
  assert mj_model.nq == 2 * nq_single, (mj_model.nq, nq_single)
  qposes = np.concatenate(
      [ref_qposes[:T], rollout_qposes[:T]], axis=1)
  try:
    cam = camera if camera and any(
        mj_model.camera(i).name == camera for i in range(mj_model.ncam)
    ) else None
  except Exception:
    cam = None
  return render_qpos_trajectory(
      mj_model, qposes, out_path, fps=fps, camera=cam, size=size)


def clip_to_qposes(clip, clip_length: int) -> np.ndarray:
  """ReferenceClip -> (T, nq) qpos rows = position ++ quaternion ++ joints
  (brax_rodent_run_ppo.py:157-167)."""
  return np.hstack([
      np.asarray(clip.position)[:clip_length],
      np.asarray(clip.quaternion)[:clip_length],
      np.asarray(clip.joints)[:clip_length],
  ])
