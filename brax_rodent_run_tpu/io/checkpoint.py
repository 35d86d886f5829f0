"""Param + train-state checkpointing.

``save_params``/``load_params`` replicate the single-file flax-serialization
round trip the reference uses (brax.io.model at brax_rodent_run_ppo.py:138,
205 and render_rollout.ipynb cell 4): the saved bundle is the
(normalizer_state, policy_params, value_params) triple, loadable without any
trainer state.

``save_train_state``/``load_train_state`` close the gap SURVEY.md §5 calls
out (the reference has checkpoints but NO resume): the full TrainingState
(params, optimizer state, normalizer, env_steps) round-trips so training can
resume exactly.
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any

import jax
from flax import serialization


def save_params(path: str, params: Any) -> None:
  """Serialize a params pytree to a single file (brax.io.model contract).

  Atomic: writes to a UNIQUE temp file in the same directory then
  os.replace()s it over the target, so a crash mid-write never destroys
  the previous checkpoint and concurrent writers (e.g. a retried job
  overlapping its predecessor) cannot interleave into one torn file."""
  d = os.path.dirname(os.path.abspath(path)) or "."
  fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path) + ".",
                             suffix=".tmp")
  try:
    with os.fdopen(fd, "wb") as f:
      f.write(pickle.dumps(jax.device_get(params)))
    os.replace(tmp, path)
  except BaseException:
    try:
      os.unlink(tmp)
    except OSError:
      pass
    raise


def load_params(path: str, target: Any = None) -> Any:
  """Load params usable directly (the (normalizer_state, policy, value)
  triple round-trips as-is); ``target`` restores exact pytree types from a
  legacy state-dict-form file."""
  with open(path, "rb") as f:
    state = pickle.loads(f.read())
  if target is not None and isinstance(state, dict):
    return serialization.from_state_dict(target, state)
  if (target is None and isinstance(state, dict)
      and set(state) == {str(i) for i in range(len(state))}):
    # legacy save of a tuple via to_state_dict
    return tuple(state[str(i)] for i in range(len(state)))
  return state


def save_train_state(path: str, train_state: Any) -> None:
  save_params(path, train_state)


def load_train_state(path: str, target: Any) -> Any:
  return load_params(path, target)
