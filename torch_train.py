"""Alternative torch PPO trainer over the TorchBatchEnv bridge.

Working counterpart of the reference's vestigial TorchRL path
(torch_run.py:85-307 — broken there: undefined names at :71-75, a pixel
CNN actor bound to a state-vector env, and a missing utils module;
SURVEY.md §2.1). Same training shape — collect frames_per_batch with the
current policy, GAE, clipped-PPO epochs over minibatches with lr and
clip-epsilon annealing (torch_run.py:214-257), periodic eval — but pure
torch (no torchrl dependency) and a state-vector MLP actor-critic that
matches the env it trains (config_torch.yaml hyperparameters).

Usage:
  python torch_train.py [--config configs/torch.yaml] [key=value ...]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("MUJOCO_GL", "egl")

import numpy as np


def load_config(path: str, overrides):
  import yaml
  with open(path) as f:
    cfg = yaml.safe_load(f)
  for ov in overrides:
    k, _, v = ov.partition("=")
    d = cfg
    parts = k.split(".")
    for p in parts[:-1]:
      d = d[p]
    old = d[parts[-1]]
    d[parts[-1]] = type(old)(v) if not isinstance(old, bool) \
        else v.lower() in ("1", "true")
  return cfg


def make_models(obs_size: int, act_size: int, hidden=(256, 256)):
  import torch
  import torch.nn as nn

  def mlp(sizes, out):
    layers = []
    last = obs_size
    for h in sizes:
      layers += [nn.Linear(last, h), nn.Tanh()]
      last = h
    layers.append(nn.Linear(last, out))
    return nn.Sequential(*layers)

  actor = mlp(hidden, 2 * act_size)      # mean ‖ log_std logits
  critic = mlp(hidden, 1)
  return actor, critic


def dist_from_logits(logits, act_size):
  import torch
  mean, log_std = logits[..., :act_size], logits[..., act_size:]
  std = torch.nn.functional.softplus(log_std) + 1e-3
  return torch.distributions.Independent(
      torch.distributions.Normal(mean, std), 1)


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--config", default="configs/torch.yaml")
  ap.add_argument("overrides", nargs="*")
  args = ap.parse_args(argv)
  cfg = load_config(args.config, args.overrides)

  import torch
  import jax.numpy as jnp
  from brax_rodent_run_tpu import envs
  from brax_rodent_run_tpu.compat.torch_env import TorchBatchEnv
  from brax_rodent_run_tpu.mjcf import load_model
  from train_rodent import model_path

  torch.manual_seed(cfg["seed"])
  model = load_model(model_path(cfg["env"]["model_xml"]),
                     solver=cfg["env"]["solver"],
                     iterations=cfg["env"]["iterations"],
                     ls_iterations=cfg["env"]["ls_iterations"])
  env_kwargs = {}
  if cfg["env"]["name"] == "rodent":
    track = jnp.asarray(np.cumsum(
        np.tile([[0.002, 0.0, 0.0]], (300, 1)), axis=0), jnp.float32)
    env_kwargs["track_pos"] = track
  base_env = envs.get_environment(cfg["env"]["name"], model=model,
                                  n_frames=cfg["env"]["n_frames"],
                                  **env_kwargs)
  num_envs = cfg["collector"]["num_envs"]
  env = TorchBatchEnv(base_env, num_envs=num_envs,
                      episode_length=cfg["env"]["episode_length"])

  actor, critic = make_models(env.observation_size, env.action_size)
  lr = cfg["optim"]["lr"]
  opt = torch.optim.Adam(
      list(actor.parameters()) + list(critic.parameters()), lr=lr)

  horizon = cfg["collector"]["frames_per_batch"] // num_envs
  total_batches = cfg["collector"]["total_frames"] // \
      cfg["collector"]["frames_per_batch"]
  gamma, lam = cfg["loss"]["gamma"], cfg["loss"]["gae_lambda"]
  clip0 = cfg["loss"]["clip_epsilon"]

  obs = env.reset(seed=cfg["seed"])
  A = env.action_size
  for it in range(total_batches):
    t0 = time.time()
    # ---- collect
    obs_buf, act_buf, logp_buf, rew_buf, done_buf, val_buf = \
        [], [], [], [], [], []
    with torch.no_grad():
      for _ in range(horizon):
        dist = dist_from_logits(actor(obs), A)
        act = dist.sample()
        logp = dist.log_prob(act)
        val = critic(obs)[..., 0]
        nobs, rew, done, _ = env.step(torch.tanh(act))
        obs_buf.append(obs)
        act_buf.append(act)
        logp_buf.append(logp)
        rew_buf.append(rew)
        done_buf.append(done)
        val_buf.append(val)
        obs = nobs
      last_val = critic(obs)[..., 0]

    obs_t = torch.stack(obs_buf)                    # (T, N, O)
    act_t = torch.stack(act_buf)
    logp_t = torch.stack(logp_buf)
    rew_t = torch.stack(rew_buf)
    done_t = torch.stack(done_buf)
    val_t = torch.stack(val_buf)

    # ---- GAE (torch_run.py:214-218 role)
    adv = torch.zeros_like(rew_t)
    gae = torch.zeros(num_envs)
    nv = last_val
    for t in reversed(range(horizon)):
      nonterm = 1.0 - done_t[t]
      delta = rew_t[t] + gamma * nv * nonterm - val_t[t]
      gae = delta + gamma * lam * nonterm * gae
      adv[t] = gae
      nv = val_t[t]
    ret_t = adv + val_t
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    # ---- anneal (torch_run.py:229-238)
    frac = 1.0 - it / max(total_batches, 1)
    if cfg["optim"]["anneal_lr"]:
      for g in opt.param_groups:
        g["lr"] = lr * frac
    clip = clip0 * frac if cfg["loss"]["anneal_clip_epsilon"] else clip0

    # ---- epochs of minibatch updates (torch_run.py:241-257)
    T, N = horizon, num_envs
    flat = lambda x: x.reshape(T * N, *x.shape[2:])
    fobs, fact, flogp, fadv, fret = map(
        flat, (obs_t, act_t, logp_t, adv, ret_t))
    idx_all = torch.randperm(T * N)
    mb = cfg["loss"]["mini_batch_size"]
    losses = []
    for _ in range(cfg["loss"]["ppo_epochs"]):
      for s in range(0, T * N, mb):
        i = idx_all[s:s + mb]
        dist = dist_from_logits(actor(fobs[i]), A)
        logp = dist.log_prob(fact[i])
        ratio = torch.exp(logp - flogp[i])
        surr = torch.min(ratio * fadv[i],
                         torch.clamp(ratio, 1 - clip, 1 + clip) * fadv[i])
        v = critic(fobs[i])[..., 0]
        v_loss = cfg["loss"]["critic_coef"] * (v - fret[i]).pow(2).mean()
        ent = dist.entropy().mean()
        loss = -(surr.mean() + cfg["loss"]["entropy_coef"] * ent) + v_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))

    sps = cfg["collector"]["frames_per_batch"] / (time.time() - t0)
    print(f"[torch] batch {it + 1}/{total_batches} "
          f"reward={float(rew_t.mean()):.4f} loss={np.mean(losses):.4f} "
          f"sps={sps:.0f}", flush=True)
  return actor, critic


if __name__ == "__main__":
  main()
