"""Environment base classes: State pytree + physics-backed Env.

API contract mirrors what the reference trains against (brax PipelineEnv:
reset(rng)->State, step(State, action)->State, State(pipeline_state, obs,
reward, done, metrics, info) — Rodent_Env_Brax.py:19,71,98), implemented on
our TPU-native physics pipeline. The n_frames substeps run under lax.scan so
the compiled graph contains ONE substep body regardless of substep count
(Rodent_Env_Brax.py:53-57 uses 10 × 0.002 s).
"""

from __future__ import annotations

import abc
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from brax_rodent_run_tpu.physics import forward as fwd
from brax_rodent_run_tpu.physics.types import Data, Model, make_data


@struct.dataclass
class State:
  pipeline_state: Data
  obs: jax.Array
  reward: jax.Array
  done: jax.Array
  metrics: Dict[str, jax.Array]
  info: Dict[str, Any] = struct.field(default_factory=dict)


class Env(abc.ABC):
  """Physics-backed environment over a compiled Model."""

  def __init__(self, model: Model, n_frames: int = 1, dtype=None,
               lean_pipeline: bool = False):
    self._model = model
    self._n_frames = n_frames
    self._dtype = dtype or jnp.float32
    # production fast path: on the fused control step, skip the XLA
    # frame/sensor reconstruction (see forward.pipeline_steps_fused lean
    # docstring + the stale-field contract on pipeline_step below)
    self._lean_pipeline = lean_pipeline

  @property
  def model(self) -> Model:
    return self._model

  # brax-compat alias (render_rollout.ipynb uses env.sys)
  @property
  def sys(self) -> Model:
    return self._model

  @property
  def dt(self) -> float:
    """Control timestep: physics dt * substeps (PipelineEnv.dt contract)."""
    return self._model.opt.timestep * self._n_frames

  @property
  def n_frames(self) -> int:
    return self._n_frames

  @abc.abstractmethod
  def reset(self, rng: jax.Array) -> State:
    ...

  @abc.abstractmethod
  def step(self, state: State, action: jax.Array) -> State:
    ...

  @property
  @abc.abstractmethod
  def observation_size(self) -> int:
    ...

  @property
  def autoreset_carry_fields(self) -> tuple:
    """DERIVED Data fields this env reads from the PRE-step state in
    step() (e.g. Humanoid's com_before = data0.subtree_com). The lean
    auto-reset wrapper must restore these on reset in addition to the
    state-defining fields, or the first post-reset reward is computed
    against the pre-reset trajectory."""
    return ()

  @property
  def action_size(self) -> int:
    return self._model.nu

  # ---- physics plumbing --------------------------------------------------

  def pipeline_init(self, qpos: jax.Array, qvel: jax.Array) -> Data:
    d = make_data(self._model, dtype=self._dtype)
    d = d.replace(qpos=jnp.asarray(qpos, self._dtype),
                  qvel=jnp.asarray(qvel, self._dtype))
    return fwd.forward(self._model, d)

  def pipeline_step(self, data: Data, action: jax.Array) -> Data:
    # sensordata is only observable at the control-step boundary, so the
    # sensor stages run on the LAST substep only (identical sensordata:
    # every substep's sensors read that substep's own forward products).
    #
    # STALE-FIELD CONTRACT (fused path): when the whole control step runs
    # in one Pallas kernel, only the fields the in-repo envs/sensors read
    # are emitted; qM/qLD/qMinv, ten_length/ten_velocity/ten_moment, and
    # efc_D/efc_aref keep their make_data/prior values. With
    # lean_pipeline=True (production training path) the contract widens:
    # xpos/xquat/xmat rows other than the first free body, xipos/ximat,
    # geom/site frames, xanchor/xaxis, and sensordata also stay stale
    # (forward.pipeline_steps_fused lean docstring). Subclasses that
    # need those fields must set BRR_NO_FUSED3=1 (stage pipeline) or
    # recompute them from (qpos, qvel). Audited consumers: Rodent,
    # Humanoid, sensors, training/acting.
    data = data.replace(ctrl=jnp.asarray(action, self._dtype))

    from brax_rodent_run_tpu.ops import fused_full as ff
    if ff.eligible_steps(self._model):
      # whole control step in one Pallas kernel (substep loop in-kernel)
      return fwd.pipeline_steps_fused(self._model, data, self._n_frames,
                                      lean=self._lean_pipeline)

    def substep(d, _):
      return fwd.step(self._model, d, sensors=False), ()

    if self._n_frames > 1:
      data, _ = jax.lax.scan(substep, data, (),
                             length=self._n_frames - 1)
    return fwd.step(self._model, data)
