"""One typed config driving env + trainer + mesh.

Replaces the reference's four inconsistent config mechanisms (hardcoded
dicts at brax_rodent_run_ppo.py:39-55, never-parsed absl flags :34-37,
hydra yaml for the torch path, and a missing params.yaml — SURVEY.md §5
"Config / flag system"). Defaults reproduce the reference's production
training configuration.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class EnvConfig:
  """Environment / physics options (brax_rodent_run_ppo.py:39-55,82-90)."""
  env_name: str = "rodent"
  model_xml: str = "rodent_new.xml"
  solver: str = "cg"                # brax_rodent_run_ppo.py:52
  iterations: int = 8
  ls_iterations: int = 8
  n_frames: int = 10                # physics substeps (Rodent_Env_Brax.py:53)
  healthy_z_range: Tuple[float, float] = (0.03, 0.5)
  terminate_when_unhealthy: bool = True
  reset_noise_scale: float = 1e-2
  fix_quirks: bool = False
  # production fast path: skip XLA frame/sensor reconstruction after the
  # fused control step (stale-field contract, envs/base.pipeline_step);
  # obs/reward/done are identical — set False to keep full Data fresh
  lean_pipeline: bool = True


@dataclasses.dataclass
class ClipConfig:
  """Mocap clip selection (brax_rodent_run_ppo.py:59-77)."""
  stac_path: str = "../stac-mjx/transform_snips_new.p"
  clip_idx: int = 84
  clip_length: int = 250
  cache_dir: str = "clips"
  rescale_factor: float = 0.9       # mjx_preprocess.py:78-82


@dataclasses.dataclass
class PPOConfig:
  """Trainer hyperparameters (reference call at brax_rodent_run_ppo.py:
  97-114 plus brax defaults it inherits)."""
  num_timesteps: int = 500_000_000
  num_evals: int = 100              # eval every 5M steps
  episode_length: int = 150
  num_envs: int = 2048
  num_eval_envs: int = 128
  batch_size: int = 2048
  unroll_length: int = 10
  num_minibatches: int = 64
  num_updates_per_batch: int = 8
  learning_rate: float = 5e-5
  entropy_cost: float = 1e-3
  discounting: float = 0.97
  gae_lambda: float = 0.95
  clipping_epsilon: float = 0.3
  reward_scaling: float = 1.0
  normalize_observations: bool = True
  action_repeat: int = 1
  seed: int = 0
  # device-side lax.scan over the epoch's training steps (identical math
  # to the host loop; keep False on single-chip tunnel deployments where
  # multi-second executions crash the worker — ppo.py training_epoch)
  epoch_scan: bool = False
  # LeanAutoResetWrapper on the training env: restore only the
  # state-defining fields + obs on done (identical training math, less
  # HBM traffic; envs/wrappers.LeanAutoResetWrapper)
  lean_autoreset: bool = True
  # network sizes: brax defaults (SURVEY.md §2.3 PPO row)
  policy_hidden: Tuple[int, ...] = (32, 32, 32, 32)
  value_hidden: Tuple[int, ...] = (256, 256, 256, 256, 256)


@dataclasses.dataclass
class MeshConfig:
  """Device mesh / multi-host (SURVEY.md §7 step 6)."""
  num_devices: int = 0              # 0 = all local devices
  distributed: bool = False         # jax.distributed.initialize per host
  coordinator: Optional[str] = None
  num_processes: int = 1
  process_id: int = 0


@dataclasses.dataclass
class RunConfig:
  """Experiment orchestration: logging, checkpoints, eval videos."""
  project: str = "rodent-tpu"
  run_name: str = ""
  logdir: str = "runs"
  checkpoint_dir: str = "model_checkpoints"
  log_wandb: bool = True            # falls back to JSONL when absent
  render_video: bool = True
  video_length: int = 500           # brax_rodent_run_ppo.py:145
  video_size: Tuple[int, int] = (512, 512)
  resume_from: str = ""             # full train-state checkpoint path


@dataclasses.dataclass
class Config:
  env: EnvConfig = dataclasses.field(default_factory=EnvConfig)
  clip: ClipConfig = dataclasses.field(default_factory=ClipConfig)
  ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)
  mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
  run: RunConfig = dataclasses.field(default_factory=RunConfig)

  def to_dict(self) -> dict:
    return dataclasses.asdict(self)

  def to_json(self) -> str:
    return json.dumps(self.to_dict(), indent=2)

  @classmethod
  def from_dict(cls, d: dict) -> "Config":
    def build(tp, sub):
      fields = {f.name: f for f in dataclasses.fields(tp)}
      kw = {}
      for k, v in (sub or {}).items():
        if k not in fields:
          raise KeyError(f"unknown config key {tp.__name__}.{k}")
        ft = fields[k].type
        if isinstance(v, list):
          v = tuple(v)
        kw[k] = v
      return tp(**kw)

    return cls(
        env=build(EnvConfig, d.get("env")),
        clip=build(ClipConfig, d.get("clip")),
        ppo=build(PPOConfig, d.get("ppo")),
        mesh=build(MeshConfig, d.get("mesh")),
        run=build(RunConfig, d.get("run")),
    )

  @classmethod
  def from_file(cls, path: str) -> "Config":
    with open(path) as f:
      if path.endswith((".yaml", ".yml")):
        import yaml
        return cls.from_dict(yaml.safe_load(f))
      return cls.from_dict(json.load(f))

  def apply_overrides(self, overrides) -> "Config":
    """Apply dotted-path overrides, e.g. ["ppo.num_envs=4096"]."""
    cfg = self
    for ov in overrides:
      path, _, raw = ov.partition("=")
      section, _, key = path.partition(".")
      sub = getattr(cfg, section)
      old = getattr(sub, key)  # raises if unknown
      val = _parse(raw, old)
      cfg = dataclasses.replace(
          cfg, **{section: dataclasses.replace(sub, **{key: val})})
    return cfg


def _parse(raw: str, old):
  if isinstance(old, bool):
    return raw.lower() in ("1", "true", "yes")
  if isinstance(old, int):
    return int(raw)
  if isinstance(old, float):
    return float(raw)
  if isinstance(old, tuple):
    parts = [p for p in raw.strip("()[] ").split(",") if p]
    elem = type(old[0]) if old else float
    return tuple(elem(p) for p in parts)
  return raw
