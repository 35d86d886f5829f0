"""Flag-A/B driver for the on-chip kernel-vs-stage numerics gate.

Runs tpu_golden_check._kernel_vs_stage under a ladder of kernel flag
combos, ONE CHILD PROCESS PER COMBO (the fused-kernel flags are read at
kernel-build time behind lru caches, so they cannot be flipped
in-process). Prints one line per combo:

  <combo-name> kerr=<max |qpos/qvel| diff>   (or CRASH/timeout tail)

Used to bisect Mosaic-only miscompiles: interpret-mode parity is green
for every combo (tests/test_ops.py), so any combo failing here fails
ONLY under the real Mosaic compiler.
"""

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.abspath(__file__))

COMBOS = [
    ("default(fori+lspar+paired)", {}),
    ("unroll", {"BRR_CG_UNROLL": "1"}),
    ("fori+lsseq", {"BRR_LS_SEQ": "1"}),
    ("fori+split", {"BRR_CHOL_SPLIT": "1"}),
    ("unroll+lsseq", {"BRR_CG_UNROLL": "1", "BRR_LS_SEQ": "1"}),
]

# every kernel flag any combo could care about: stripped from the
# inherited environment before each combo so a BRR_* var already set in
# the parent shell cannot leak into combos that don't set it (advisor
# r4: a leaked BRR_LS_SEQ makes the "default" rung silently sequential
# and the bisect misattributes the miscompile)
_KERNEL_FLAGS = ("BRR_CG_UNROLL", "BRR_LS_SEQ", "BRR_LS_PAR",
                 "BRR_CHOL_SPLIT", "BRR_CHOL_SPARSE", "BRR_CHOL_COL",
                 "BRR_FF_LANES", "BRR_NO_FUSED", "BRR_NO_FUSED2",
                 "BRR_NO_FUSED3")

_CHILD = r"""
import json
import tpu_golden_check as g
mj, m = g._load_model()
print(json.dumps({"kerr": g._kernel_vs_stage(mj, m)}), flush=True)
"""


def main() -> int:
  only = sys.argv[1:] or None
  for name, flags in COMBOS:
    if only and name not in only:
      continue
    env = {k: v for k, v in os.environ.items() if k not in _KERNEL_FLAGS}
    env.update(flags)
    try:
      r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                         capture_output=True, text=True, timeout=1500,
                         cwd=_ROOT)
    except subprocess.TimeoutExpired:
      print(f"{name} TIMEOUT", flush=True)
      continue
    line = ""
    for ln in reversed(r.stdout.splitlines()):
      if ln.startswith('{"kerr"'):
        line = ln
        break
    if r.returncode != 0 or not line:
      tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
      print(f"{name} CRASH rc={r.returncode}: {' | '.join(tail)}",
            flush=True)
      continue
    kerr = json.loads(line)["kerr"]
    print(f"{name} kerr={kerr:.3e}", flush=True)
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
