"""Environment registry (mirrors brax envs.register_environment /
get_environment used at brax_rodent_run_ppo.py:57,82)."""

from __future__ import annotations

from typing import Callable, Dict

from brax_rodent_run_tpu.envs.base import Env, State  # noqa: F401
from brax_rodent_run_tpu.envs.humanoid import Humanoid
from brax_rodent_run_tpu.envs.rodent import Rodent
from brax_rodent_run_tpu.envs import wrappers  # noqa: F401

_REGISTRY: Dict[str, Callable[..., Env]] = {}


def register_environment(name: str, factory: Callable[..., Env]) -> None:
  _REGISTRY[name] = factory


def get_environment(name: str, **kwargs) -> Env:
  return _REGISTRY[name](**kwargs)


register_environment("rodent", Rodent)
register_environment("humanoid", Humanoid)
