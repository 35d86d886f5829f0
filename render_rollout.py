"""Offline eval: load saved params, roll out the policy, render video +
kinematics plots.

Script equivalent of the reference's render_rollout.ipynb: rebuilds the
inference fn from the saved (normalizer_state, policy, value) triple
without any trainer state (cells 3-4), runs a jitted rollout (cell 8 —
ours is one lax.scan, not a Python step loop), renders mp4 on the pair
model (cell 9), and writes reward/kinematics plots stitched next to the
video frames (cells 14-16 -> a PNG per run here).

Usage:
  python render_rollout.py --params model_checkpoints/<run>/final \
      [--steps 1000] [--out out/] [section.key=value ...]
"""

from __future__ import annotations

import argparse
import os

# must precede any (transitive) `import mujoco` (GL backend is chosen at
# package import time)
os.environ.setdefault("MUJOCO_GL", "egl")

import numpy as np


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--params", required=True)
  ap.add_argument("--steps", type=int, default=1000)
  ap.add_argument("--out", default="out")
  ap.add_argument("--seed", type=int, default=0)
  ap.add_argument("--config", default="")
  ap.add_argument("overrides", nargs="*")
  args = ap.parse_args(argv)

  import jax
  # honor JAX_PLATFORMS=cpu despite the axon sitecustomize (see
  # train_rodent.py)
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
  import jax.numpy as jnp

  from brax_rodent_run_tpu import envs
  from brax_rodent_run_tpu.io import checkpoint as ckpt
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.training import networks as ppo_networks
  from brax_rodent_run_tpu.utils.config import Config
  from train_rodent import get_clip, model_path

  cfg = Config.from_file(args.config) if args.config else Config()
  cfg = cfg.apply_overrides(args.overrides)

  model = load_model(model_path(cfg.env.model_xml), solver=cfg.env.solver,
                       iterations=cfg.env.iterations,
                       ls_iterations=cfg.env.ls_iterations)
  env_kwargs = {}
  clip = None
  if cfg.env.env_name == "rodent":
    clip = get_clip(cfg, model)
    env_kwargs["track_pos"] = jnp.asarray(clip.position)
  env = envs.get_environment(cfg.env.env_name, model=model,
                             n_frames=cfg.env.n_frames, **env_kwargs)

  # rebuild inference fn from saved params only (render_rollout.ipynb cell 3)
  networks = ppo_networks.make_ppo_networks(
      observation_size=env.observation_size, action_size=env.action_size,
      policy_hidden_layer_sizes=tuple(cfg.ppo.policy_hidden),
      value_hidden_layer_sizes=tuple(cfg.ppo.value_hidden))
  make_policy = ppo_networks.make_inference_fn(networks)
  params = ckpt.load_params(args.params)
  policy = make_policy(params, deterministic=True)

  def rollout(rng):
    state = env.reset(rng)

    def f(carry, _):
      state, k = carry
      k, ak = jax.random.split(k)
      act, _ = policy(state.obs, ak)
      state = env.step(state, act)
      return (state, k), (state.pipeline_state.qpos, state.reward,
                          state.done)

    (_, _), (qposes, rewards, dones) = jax.lax.scan(
        f, (state, rng), (), length=args.steps)
    return qposes, rewards, dones

  qposes, rewards, dones = jax.jit(rollout)(jax.random.PRNGKey(args.seed))
  qposes = np.asarray(qposes)
  rewards = np.asarray(rewards)
  os.makedirs(args.out, exist_ok=True)
  np.savez(os.path.join(args.out, "rollout.npz"),
           qpos=qposes, reward=rewards, done=np.asarray(dones))
  print(f"[render] rollout: {args.steps} steps, "
        f"mean reward {rewards.mean():.4f}")

  # kinematics + reward plots (render_rollout.ipynb cells 14-16)
  try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(3, 1, figsize=(10, 9), sharex=True)
    axes[0].plot(rewards)
    axes[0].set_ylabel("reward")
    axes[1].plot(qposes[:, 0], label="x")
    axes[1].plot(qposes[:, 1], label="y")
    axes[1].plot(qposes[:, 2], label="z")
    axes[1].legend()
    axes[1].set_ylabel("root pos [m]")
    axes[2].plot(qposes[:, 7:15])
    axes[2].set_ylabel("first joints [rad]")
    axes[2].set_xlabel("control step")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "kinematics.png"), dpi=120)
    print(f"[render] plots -> {args.out}/kinematics.png")
  except Exception as e:
    print(f"[render] plots skipped: {e}")

  # video (pair model for rodent, plain model otherwise)
  try:
    from brax_rodent_run_tpu.io import video as video_mod
    out_mp4 = os.path.join(args.out, "rollout.mp4")
    if clip is not None:
      ref_q = video_mod.clip_to_qposes(clip, cfg.clip.clip_length)
      out_mp4 = video_mod.render_pair_eval(
          model_path("rodent_pair.xml"), ref_q, qposes, out_mp4,
          fps=1.0 / env.dt)
    else:
      import mujoco
      mj_model = mujoco.MjModel.from_xml_path(model_path(cfg.env.model_xml))
      out_mp4 = video_mod.render_qpos_trajectory(mj_model, qposes, out_mp4,
                                                 fps=1.0 / env.dt)
    print(f"[render] video -> {out_mp4}")
  except Exception as e:
    print(f"[render] video skipped: {e}")


if __name__ == "__main__":
  main()
