"""TPU pod-slice launcher (the reference's slurm.py, TPU-native).

The reference submits a single-node 4-GPU sbatch job (slurm.py:10-27).
The TPU equivalent launches ONE process per host across a pod slice via
`gcloud compute tpus tpu-vm ssh --worker=all`, each process running
train_rodent.py with mesh.distributed=true; jax.distributed auto-detects
the coordinator on TPU. A --slurm mode emits an sbatch script for
SLURM-managed TPU (or CPU-test) clusters for parity with the reference
workflow.

Examples:
  python launch_tpu.py --tpu my-pod --zone us-central2-b -- \
      ppo.num_envs=4096 ppo.num_timesteps=500000000
  python launch_tpu.py --slurm --partition tpu -- ppo.num_envs=2048
  python launch_tpu.py --dry-run --tpu my-pod
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def tpu_command(args, overrides) -> list[str]:
  train = " ".join(
      ["python3", args.script, "mesh.distributed=true"]
      + [shlex.quote(o) for o in overrides])
  remote = f"cd {shlex.quote(args.workdir)} && {train}"
  return [
      "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
      f"--zone={args.zone}", "--worker=all",
      f"--command={remote}",
  ]


def slurm_script(args, overrides) -> str:
  train = " ".join(["python3", args.script] + list(overrides))
  return f"""#!/bin/bash
#SBATCH --job-name=rodent-tpu
#SBATCH --partition={args.partition}
#SBATCH --nodes={args.nodes}
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH --mem=64G
#SBATCH --time={args.time}
srun {train} mesh.distributed=true
"""


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--tpu", default="", help="TPU VM / pod slice name")
  ap.add_argument("--zone", default="us-central2-b")
  ap.add_argument("--workdir", default="~/brax-rodent-run-tpu")
  ap.add_argument("--script", default="train_rodent.py")
  ap.add_argument("--slurm", action="store_true")
  ap.add_argument("--partition", default="tpu")
  ap.add_argument("--nodes", type=int, default=1)
  ap.add_argument("--time", default="5:00:00")
  ap.add_argument("--dry-run", action="store_true")
  ap.add_argument("overrides", nargs="*")
  args = ap.parse_args(argv)

  if args.slurm:
    script = slurm_script(args, args.overrides)
    if args.dry_run:
      print(script)
      return 0
    proc = subprocess.run(["sbatch"], input=script.encode(), check=False)
    return proc.returncode

  if not args.tpu:
    ap.error("--tpu NAME required (or use --slurm)")
  cmd = tpu_command(args, args.overrides)
  if args.dry_run:
    print(" ".join(shlex.quote(c) for c in cmd))
    return 0
  return subprocess.run(cmd, check=False).returncode


if __name__ == "__main__":
  sys.exit(main())
