"""Interleaved A/B bench harness (VERDICT r4 #6).

Cross-window throughput noise on the shared axon tunnel is +/-28%
(PERF_NOTES.md: 60.1k morning vs 92.3k evening on IDENTICAL configs), so
single-shot A-then-B comparisons are worthless across windows. This
harness alternates A/B/A/B... within ONE window, >=3 reps each, and
reports per-config median + spread plus the pairwise rep deltas — the
within-window interleave cancels the tunnel's slow drift.

Usage:
  python tpu_interleave_ab.py NAME_A 'JSON_FLAGS_A' NAME_B 'JSON_FLAGS_B' \
      [--reps 3] [--envs 2048] [--model rodent_optimized.xml]

Example:
  python tpu_interleave_ab.py lspar '{}' lsseq '{"BRR_LS_SEQ":"1"}'

Each rep is a fresh child process (kernel flags are read at build time
behind lru caches); compiles hit .jax_cache so only the first rep per
config pays. The numerics gate runs on the FIRST rep of each config
only (BRR_BENCH_NO_GATE skips it on later reps).

Prints one final JSON line:
  {"ab": [{"name", "flags", "values", "median", "spread_pct",
           "gate_ok"}...], "deltas_pct": [...], "median_delta_pct": N}
"""

import argparse
import json
import os
import statistics
import subprocess
import sys

_ROOT = os.path.dirname(os.path.abspath(__file__))

# strip inherited kernel flags so a stray BRR_* in the parent shell
# cannot contaminate a combo that doesn't set it (advisor r4)
_KERNEL_FLAGS = ("BRR_CG_UNROLL", "BRR_LS_SEQ", "BRR_LS_PAR",
                 "BRR_CHOL_SPLIT", "BRR_FF_LANES", "BRR_NO_FUSED",
                 "BRR_NO_FUSED2", "BRR_NO_FUSED3")


def _run_one(flags, envs, model, gate: bool, timeout_s: float):
  env = {k: v for k, v in os.environ.items() if k not in _KERNEL_FLAGS}
  env.update(flags)
  env["BRR_BENCH_NO_RETRY"] = "1"
  env["BRR_BENCH_ENVS"] = str(envs)
  env["BRR_BENCH_MODEL"] = model
  if not gate:
    env["BRR_BENCH_NO_GATE"] = "1"
  try:
    r = subprocess.run([sys.executable, os.path.join(_ROOT, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=timeout_s, cwd=_ROOT)
  except subprocess.TimeoutExpired:
    return {"error": "timeout"}
  for line in reversed(r.stdout.splitlines()):
    if line.startswith('{"gate_failed"'):
      return {"error": "gate_failed", "detail": json.loads(line)}
    if line.startswith('{"metric"'):
      return json.loads(line)
  tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
  return {"error": f"crash rc={r.returncode}", "tail": tail}


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("name_a")
  ap.add_argument("flags_a")
  ap.add_argument("name_b")
  ap.add_argument("flags_b")
  ap.add_argument("--reps", type=int, default=3)
  ap.add_argument("--envs", type=int, default=2048)
  ap.add_argument("--model", default="rodent_optimized.xml")
  ap.add_argument("--timeout", type=float, default=3300.0)
  args = ap.parse_args()

  cfgs = [
      {"name": args.name_a, "flags": json.loads(args.flags_a),
       "values": [], "gate_ok": None},
      {"name": args.name_b, "flags": json.loads(args.flags_b),
       "values": [], "gate_ok": None},
  ]
  for rep in range(args.reps):
    for c in cfgs:
      first = rep == 0
      # first rep pays compile (and the gate); a generous leash there,
      # short after
      to = args.timeout if first else 600.0
      rec = _run_one(c["flags"], args.envs, args.model, gate=first,
                     timeout_s=to)
      if "error" in rec:
        print(f"[ab] {c['name']} rep{rep}: {rec}", flush=True)
        if rec.get("error") == "gate_failed":
          c["gate_ok"] = False
        continue
      if first and rec.get("gate_ok") is not None:
        c["gate_ok"] = rec["gate_ok"]
      v = rec.get("value")
      if v:
        c["values"].append(v)
        print(f"[ab] {c['name']} rep{rep}: {v}", flush=True)

  out = {"ab": [], "envs": args.envs, "model": args.model}
  for c in cfgs:
    vals = c["values"]
    med = statistics.median(vals) if vals else None
    spread = (100.0 * (max(vals) - min(vals)) / med
              if vals and med else None)
    out["ab"].append({
        "name": c["name"], "flags": c["flags"], "values": vals,
        "median": med,
        "spread_pct": round(spread, 2) if spread is not None else None,
        "gate_ok": c["gate_ok"],
    })
  a, b = cfgs
  deltas = [round(100.0 * (va / vb - 1.0), 2)
            for va, vb in zip(a["values"], b["values"])]
  out["deltas_pct_a_vs_b"] = deltas
  if deltas:
    out["median_delta_pct_a_vs_b"] = round(statistics.median(deltas), 2)
  print(json.dumps(out), flush=True)
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
