"""Torch bridge: TorchBatchEnv reset/step round trip + a torch PPO batch."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.conftest import model_path
from brax_rodent_run_tpu.compat.torch_env import TorchBatchEnv
from brax_rodent_run_tpu.envs.humanoid import Humanoid
from brax_rodent_run_tpu.mjcf import load_model


@pytest.fixture(scope="module")
def tenv():
  m = load_model(model_path("humanoid.xml"))
  return TorchBatchEnv(Humanoid(m, n_frames=2), num_envs=4,
                       episode_length=8)


def test_reset_step_types(tenv):
  obs = tenv.reset(seed=0)
  assert isinstance(obs, torch.Tensor)
  assert obs.shape == (4, tenv.observation_size)
  act = torch.zeros(4, tenv.action_size)
  obs2, rew, done, info = tenv.step(act)
  assert obs2.shape == obs.shape
  assert rew.shape == (4,) and done.shape == (4,)
  assert all(isinstance(v, torch.Tensor) for v in info.values())
  assert torch.isfinite(obs2).all()


def test_autoreset_keeps_stepping(tenv):
  tenv.reset(seed=1)
  act = torch.zeros(4, tenv.action_size)
  saw_done = False
  for _ in range(12):                    # episode_length=8 -> wraps
    obs, rew, done, _ = tenv.step(act)
    saw_done = saw_done or bool(done.any())
  assert saw_done
  assert torch.isfinite(obs).all()


def test_torch_ppo_one_batch(tmp_path):
  """torch_train.py runs one full collect+update batch on humanoid."""
  import yaml
  from torch_train import main

  cfg = {
      "seed": 0,
      "env": {"name": "humanoid", "model_xml": "humanoid.xml",
              "solver": "newton", "iterations": 4, "ls_iterations": 4,
              "n_frames": 2, "episode_length": 8},
      "collector": {"num_envs": 4, "frames_per_batch": 16,
                    "total_frames": 32},
      "optim": {"lr": 3.0e-4, "anneal_lr": True},
      "loss": {"gamma": 0.99, "gae_lambda": 0.95, "clip_epsilon": 0.2,
               "anneal_clip_epsilon": True, "ppo_epochs": 2,
               "mini_batch_size": 8, "critic_coef": 0.25,
               "entropy_coef": 0.0},
  }
  p = tmp_path / "cfg.yaml"
  p.write_text(yaml.safe_dump(cfg))
  actor, critic = main(["--config", str(p)])
  for param in actor.parameters():
    assert torch.isfinite(param).all()
