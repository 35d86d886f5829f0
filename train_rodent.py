"""Training entry point: PPO on the rodent mocap-tracking task.

The TPU-native counterpart of the reference's brax_rodent_run_ppo.py:
one typed config (file + dotted overrides) instead of hardcoded dicts,
a W&B-or-JSONL metrics sink, full train-state checkpointing with resume,
and a jitted on-device eval rollout feeding the side-by-side video render
(the reference's policy_params_fn steps the env from Python one step at a
time, brax_rodent_run_ppo.py:145-151 — ours is a single lax.scan).

Usage:
  python train_rodent.py [--config cfg.yaml] [section.key=value ...]
e.g.
  python train_rodent.py ppo.num_envs=2048 ppo.num_timesteps=1000000

Multi-host TPU pods: launch one process per host with mesh.distributed=true
(see launch_tpu.py); host 0 owns logging/checkpoints.
"""

from __future__ import annotations

import argparse
import functools
import os
import uuid

# must precede any (transitive) `import mujoco`: the GL backend for video
# rendering is chosen when the mujoco package is first imported
os.environ.setdefault("MUJOCO_GL", "egl")

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_MODELS = os.path.join(_HERE, "assets")


def model_path(name: str) -> str:
  return os.path.join(_MODELS, name)


def synthetic_walk_qpos(model, n_frames: int = 250,
                        speed: float = 0.02) -> np.ndarray:
  """Fallback mocap trajectory when no stac pickle is available: qpos0
  translated forward ``speed`` m/frame with a light gait oscillation, so
  the full preprocessing + tracking pipeline runs out-of-the-box."""
  qpos = np.tile(np.asarray(model.qpos0, np.float64), (n_frames, 1))
  t = np.arange(n_frames)[:, None]
  qpos[:, 0:1] = qpos[:, 0:1] + speed * t
  # stand the walker at a healthy height: qpos0 has the root at z=0,
  # but the tracking reset places the root AT the clip position and the
  # task terminates below z=0.03 (Rodent_Env_Brax.py:28) — real stac
  # clips ride at ~0.05-0.07 m
  qpos[:, 2] = np.maximum(qpos[:, 2], 0.06)
  phase = 2.0 * np.pi * t / 25.0
  osc = 0.05 * np.sin(phase + np.arange(max(model.nq - 7, 0))[None] * 0.7)
  qpos[:, 7:] = qpos[:, 7:] + osc
  return qpos


def _clip_cache_path(cfg) -> str:
  """Cache filename keyed by everything that determines the clip contents
  (not just clip_idx — a changed stac_path/clip_length/rescale_factor or a
  synthetic-fallback run must not silently reuse a stale cache)."""
  import hashlib
  synthetic = not os.path.exists(cfg.clip.stac_path)
  key = (cfg.clip.stac_path, cfg.clip.clip_length, cfg.clip.rescale_factor,
         synthetic)
  h = hashlib.sha1(repr(key).encode()).hexdigest()[:8]
  return os.path.join(cfg.clip.cache_dir, f"{cfg.clip.clip_idx}_{h}.p")


def get_clip(cfg, model):
  """Cached ReferenceClip (brax_rodent_run_ppo.py:59-77 semantics)."""
  from brax_rodent_run_tpu.preprocessing import clips as clips_mod
  from brax_rodent_run_tpu.preprocessing.rescale import rescale_model

  os.makedirs(cfg.clip.cache_dir, exist_ok=True)
  cache = _clip_cache_path(cfg)
  if os.path.exists(cache):
    return clips_mod.load_clip_pickle(cache)
  if os.path.exists(cfg.clip.stac_path):
    clip = clips_mod.process_clip_to_train(
        cfg.clip.stac_path,
        scale_factor=cfg.clip.rescale_factor,
        start_step=cfg.clip.clip_idx * cfg.clip.clip_length,
        clip_length=cfg.clip.clip_length,
        model=model)
  else:
    print(f"[train] stac pickle {cfg.clip.stac_path} not found; "
          "using synthetic forward-walk clip")
    qpos = synthetic_walk_qpos(model, cfg.clip.clip_length)
    clip = clips_mod.process_clip(
        clips_mod.jnp.asarray(qpos), rescale_model(
            model, cfg.clip.rescale_factor))
  clips_mod.save_clip_pickle(cache, clip)
  return clip


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--config", default="", help="yaml/json config file")
  ap.add_argument("overrides", nargs="*", help="section.key=value")
  args = ap.parse_args(argv)

  from brax_rodent_run_tpu.utils.config import Config
  cfg = Config.from_file(args.config) if args.config else Config()
  cfg = cfg.apply_overrides(args.overrides)

  # distributed init must precede any jax device use
  if cfg.mesh.distributed:
    from brax_rodent_run_tpu.parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed(cfg.mesh.coordinator,
                                    cfg.mesh.num_processes or None,
                                    cfg.mesh.process_id or None)

  import jax
  # the axon sitecustomize force-registers the TPU tunnel backend even
  # when JAX_PLATFORMS=cpu is exported; honor the user's choice before
  # the first device query (a hung tunnel would stall CPU runs at init)
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp
  from brax_rodent_run_tpu import envs
  from brax_rodent_run_tpu.io import checkpoint as ckpt
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.parallel import mesh as mesh_mod
  from brax_rodent_run_tpu.training import networks as ppo_networks
  from brax_rodent_run_tpu.training import ppo
  from brax_rodent_run_tpu.utils.metrics import MetricsSink

  is_host0 = jax.process_index() == 0

  model = load_model(model_path(cfg.env.model_xml), solver=cfg.env.solver,
                     iterations=cfg.env.iterations,
                     ls_iterations=cfg.env.ls_iterations)

  env_kwargs = {}
  if cfg.env.env_name == "rodent":
    clip = get_clip(cfg, model)
    env_kwargs.update(
        track_pos=jnp.asarray(clip.position),
        healthy_z_range=tuple(cfg.env.healthy_z_range),
        terminate_when_unhealthy=cfg.env.terminate_when_unhealthy,
        reset_noise_scale=cfg.env.reset_noise_scale,
        fix_quirks=cfg.env.fix_quirks,
    )
  else:
    clip = None
  env = envs.get_environment(
      cfg.env.env_name, model=model, n_frames=cfg.env.n_frames,
      lean_pipeline=cfg.env.lean_pipeline, **env_kwargs)

  run_name = cfg.run.run_name or (
      f"{cfg.env.env_name}_e{cfg.ppo.num_envs}_"
      f"b{cfg.ppo.batch_size}_{uuid.uuid4().hex[:8]}")
  sink = MetricsSink(cfg.run.logdir, run_name, project=cfg.run.project,
                     config=cfg.to_dict(),
                     use_wandb=cfg.run.log_wandb) if is_host0 else None

  ckpt_dir = os.path.join(cfg.run.checkpoint_dir, run_name)
  if is_host0:
    os.makedirs(ckpt_dir, exist_ok=True)

  mesh = mesh_mod.make_mesh(cfg.mesh.num_devices)

  # jitted eval rollout for the video callback: policy + env step scanned
  # on device, only qpos comes back to host
  def make_video_rollout(make_policy):
    eval_env = env

    def rollout(params, rng):
      policy = make_policy(params, deterministic=True)
      state = eval_env.reset(rng)

      def f(carry, _):
        state, k = carry
        k, ak = jax.random.split(k)
        act, _ = policy(state.obs, ak)
        state = eval_env.step(state, act)
        return (state, k), state.pipeline_state.qpos

      (_, _), qposes = jax.lax.scan(
          f, (state, rng), (), length=cfg.run.video_length)
      return qposes

    return jax.jit(rollout)

  video_rollout = {"fn": None}

  def progress_fn(num_steps, metrics):
    if sink is not None:
      sink.log(metrics, num_steps)
      pretty = {k: round(float(v), 5) for k, v in metrics.items()
                if isinstance(v, (int, float, np.floating))}
      print(f"[train] step={num_steps} {pretty}", flush=True)

  def policy_params_fn(num_steps, make_policy, params):
    if not is_host0:
      return
    ckpt.save_params(os.path.join(ckpt_dir, f"{num_steps}"), params)
    if not (cfg.run.render_video and cfg.env.env_name == "rodent"):
      return
    try:
      if video_rollout["fn"] is None:
        video_rollout["fn"] = make_video_rollout(make_policy)
      qposes = np.asarray(video_rollout["fn"](
          params, jax.random.PRNGKey(num_steps % (2**31 - 1))))
      from brax_rodent_run_tpu.io import video as video_mod
      ref_q = video_mod.clip_to_qposes(clip, cfg.clip.clip_length)
      out = os.path.join(sink.dir, f"eval_{num_steps:012d}.mp4")
      out = video_mod.render_pair_eval(
          model_path("rodent_pair.xml"), ref_q, qposes, out,
          fps=1.0 / env.dt, size=cfg.run.video_size)
      sink.log_video(out, num_steps, fps=int(1.0 / env.dt))
    except Exception as e:  # rendering is best-effort (no GL on workers)
      print(f"[train] video eval skipped: {e}", flush=True)

  network_factory = functools.partial(
      ppo_networks.make_ppo_networks,
      policy_hidden_layer_sizes=tuple(cfg.ppo.policy_hidden),
      value_hidden_layer_sizes=tuple(cfg.ppo.value_hidden))

  # resume_from: a full train-state file ("train_state.pkl", written every
  # eval epoch) resumes exactly; anything else is a bare params triple
  restore = None
  restore_ckpt = None
  if cfg.run.resume_from:
    if os.path.basename(cfg.run.resume_from).startswith("train_state"):
      restore_ckpt = cfg.run.resume_from
    else:
      restore = ckpt.load_params(cfg.run.resume_from)

  make_policy, params, metrics = ppo.train(
      environment=env,
      num_timesteps=cfg.ppo.num_timesteps,
      episode_length=cfg.ppo.episode_length,
      action_repeat=cfg.ppo.action_repeat,
      num_envs=cfg.ppo.num_envs,
      num_eval_envs=cfg.ppo.num_eval_envs,
      learning_rate=cfg.ppo.learning_rate,
      entropy_cost=cfg.ppo.entropy_cost,
      discounting=cfg.ppo.discounting,
      seed=cfg.ppo.seed,
      unroll_length=cfg.ppo.unroll_length,
      batch_size=cfg.ppo.batch_size,
      num_minibatches=cfg.ppo.num_minibatches,
      num_updates_per_batch=cfg.ppo.num_updates_per_batch,
      num_evals=cfg.ppo.num_evals,
      normalize_observations=cfg.ppo.normalize_observations,
      epoch_scan=cfg.ppo.epoch_scan,
      lean_autoreset=cfg.ppo.lean_autoreset,
      reward_scaling=cfg.ppo.reward_scaling,
      clipping_epsilon=cfg.ppo.clipping_epsilon,
      gae_lambda=cfg.ppo.gae_lambda,
      network_factory=network_factory,
      progress_fn=progress_fn,
      policy_params_fn=policy_params_fn,
      mesh=mesh,
      restore_params=restore,
      checkpoint_path=os.path.join(ckpt_dir, "train_state.pkl"),
      restore_checkpoint_path=restore_ckpt,
  )

  if is_host0:
    final = os.path.join(ckpt_dir, "final")
    ckpt.save_params(final, params)
    print(f"[train] done; final params -> {final}")
    sink.close()
  return make_policy, params, metrics


if __name__ == "__main__":
  main()
