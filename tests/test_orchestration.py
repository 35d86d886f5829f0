"""Config system, metrics sink, launcher, and parallel-mesh helpers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from brax_rodent_run_tpu.parallel import mesh as mesh_mod
from brax_rodent_run_tpu.utils.config import Config
from brax_rodent_run_tpu.utils.metrics import MetricsSink


def test_config_defaults_match_reference():
  """Defaults reproduce the production config (brax_rodent_run_ppo.py:
  39-55,97-114)."""
  cfg = Config()
  assert cfg.ppo.num_timesteps == 500_000_000
  assert cfg.ppo.episode_length == 150
  assert cfg.ppo.unroll_length == 10
  assert cfg.ppo.num_minibatches == 64
  assert cfg.ppo.num_updates_per_batch == 8
  assert cfg.ppo.learning_rate == 5e-5
  assert cfg.ppo.discounting == 0.97
  assert cfg.ppo.clipping_epsilon == 0.3
  assert cfg.env.solver == "cg" and cfg.env.iterations == 8
  assert cfg.env.n_frames == 10


def test_config_overrides_and_roundtrip(tmp_path):
  cfg = Config().apply_overrides(
      ["ppo.num_envs=4096", "env.solver=newton", "run.render_video=false",
       "env.healthy_z_range=(0.05,0.4)"])
  assert cfg.ppo.num_envs == 4096
  assert cfg.env.solver == "newton"
  assert cfg.run.render_video is False
  assert cfg.env.healthy_z_range == (0.05, 0.4)

  p = tmp_path / "cfg.json"
  p.write_text(cfg.to_json())
  cfg2 = Config.from_file(str(p))
  assert cfg2.ppo.num_envs == 4096
  assert cfg2.env.healthy_z_range == (0.05, 0.4)

  with pytest.raises(Exception):
    Config().apply_overrides(["ppo.not_a_key=1"])


def test_metrics_sink_jsonl(tmp_path):
  sink = MetricsSink(str(tmp_path), "run1", config={"a": 1},
                     use_wandb=False)
  sink.log({"loss": 1.5, "reward": np.float32(2.0)}, step=10)
  sink.log({"loss": 1.0}, step=20)
  sink.close()
  lines = [json.loads(l) for l in
           open(tmp_path / "run1" / "metrics.jsonl")]
  assert lines[0]["step"] == 10 and lines[0]["loss"] == 1.5
  assert lines[1]["step"] == 20
  assert json.load(open(tmp_path / "run1" / "config.json")) == {"a": 1}


def test_launcher_dry_run():
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  out = subprocess.run(
      [sys.executable, os.path.join(repo, "launch_tpu.py"), "--dry-run",
       "--tpu", "pod0", "--zone", "us-central2-b", "ppo.num_envs=2048"],
      capture_output=True, text=True, check=True).stdout
  assert "gcloud" in out and "--worker=all" in out
  assert "mesh.distributed=true" in out and "ppo.num_envs=2048" in out

  out = subprocess.run(
      [sys.executable, os.path.join(repo, "launch_tpu.py"), "--dry-run",
       "--slurm", "--nodes", "2"],
      capture_output=True, text=True, check=True).stdout
  assert "#SBATCH --nodes=2" in out and "srun" in out


def test_mesh_helpers_fake_devices():
  mesh = mesh_mod.make_mesh()            # 8 fake CPU devices (conftest)
  assert mesh.devices.size == 8
  sl = mesh_mod.local_batch_slice(mesh, 64)
  assert sl == slice(0, 64)              # single process owns everything
  arr = mesh_mod.host_local_array(mesh, (64, 3),
                                  np.ones((64, 3), np.float32))
  assert arr.shape == (64, 3)
  assert len(arr.sharding.device_set) == 8


def test_video_qpos_stitching():
  from brax_rodent_run_tpu.io import video as video_mod

  class FakeClip:
    position = np.zeros((250, 3))
    quaternion = np.tile([1.0, 0, 0, 0], (250, 1))
    joints = np.zeros((250, 67))

  q = video_mod.clip_to_qposes(FakeClip(), 250)
  assert q.shape == (250, 74)            # rodent_new nq
  np.testing.assert_allclose(q[0, 3:7], [1, 0, 0, 0])
