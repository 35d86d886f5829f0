"""Turn a training run's metrics.jsonl into LEARNING.md (VERDICT r2 #5:
the config-3 learning-curve artifact — eval reward vs env steps vs
wall-clock at 2048 envs, the second half of the BASELINE.json metric).

Usage: python make_learning_report.py runs/<run_name> [--out LEARNING.md]
"""

import argparse
import json
import os


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("run_dir", help="directory containing metrics.jsonl")
  ap.add_argument("--out", default="LEARNING.md")
  ap.add_argument("--append", action="store_true")
  args = ap.parse_args()

  rows = []
  with open(os.path.join(args.run_dir, "metrics.jsonl")) as f:
    for line in f:
      rows.append(json.loads(line))
  evals = [r for r in rows if "eval/episode_reward" in r]
  if not evals:
    raise SystemExit("no eval rows in metrics.jsonl")

  cfg = {}
  cfg_path = os.path.join(args.run_dir, "config.json")
  if os.path.exists(cfg_path):
    with open(cfg_path) as f:
      cfg = json.load(f)
  ppo = cfg.get("ppo", {})
  env = cfg.get("env", {})

  final = evals[-1]
  best = max(evals, key=lambda r: r["eval/episode_reward"])
  sps = [r.get("training/sps") for r in rows if r.get("training/sps")]

  lines = [
      f"## Run `{os.path.basename(args.run_dir.rstrip('/'))}`",
      "",
      f"- model: `{env.get('model_xml', '?')}`, envs: "
      f"{ppo.get('num_envs', '?')}, total steps: "
      f"{ppo.get('num_timesteps', '?')}",
      f"- final eval reward: **{final['eval/episode_reward']:.2f}** at "
      f"step {final['step']:,} "
      f"(wall-clock {final['time'] / 3600.0:.2f} h)",
      f"- best eval reward: {best['eval/episode_reward']:.2f} at step "
      f"{best['step']:,}",
  ]
  if sps:
    lines.append(f"- training sps (env steps/s incl. learning): "
                 f"mean {sum(sps) / len(sps):,.0f}, last {sps[-1]:,.0f}")
  lines += [
      "",
      "| env steps | wall-clock (min) | eval reward | eval ep length |",
      "|---|---|---|---|",
  ]
  for r in evals:
    lines.append(
        f"| {r['step']:,} | {r['time'] / 60.0:.1f} | "
        f"{r['eval/episode_reward']:.2f} | "
        f"{r.get('eval/avg_episode_length', float('nan')):.1f} |")
  lines.append("")
  body = "\n".join(lines)

  mode = "a" if args.append and os.path.exists(args.out) else "w"
  with open(args.out, mode) as f:
    if mode == "w":
      f.write("# Learning curves (on-chip training runs)\n\n")
    f.write(body + "\n")
  print(f"wrote {args.out}: final reward "
        f"{final['eval/episode_reward']:.2f} @ {final['step']:,} steps")


if __name__ == "__main__":
  main()
