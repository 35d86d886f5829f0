"""Dump + histogram the fused kernel's Mosaic MLIR (VERDICT r4 #3).

Three rounds of analytic perf models (flop roofline -> latency ->
op-issue) were each falsified by the next on-chip measurement; this tool
replaces arithmetic with COMPILER output. It lowers the batched
whole-control-step kernel (client-side; no execution, but the backend
must be importable, so run it while the tunnel is up — or on CPU with
JAX_PLATFORMS='' if the axon plugin registers), captures the Mosaic
module that `debug=True` prints, and emits:

  - an op histogram: count, and total 8x128-f32 TILE-ISSUES implied by
    each op's vector type (the unit the VPU actually retires)
  - totals per dialect, plus the top shapes

Tile-issues are the decisive statistic: if section time tracks
tile-issues (not raw flops and not op count), the kernel is
VPU-throughput-bound at tile granularity, widening lanes past 128 buys
nothing (a 256-lane op is just 2 issues — r4's falsified 2x
prediction), and the lever is SKIPPING structurally-zero tiles.

Usage: python dump_mosaic.py [--model rodent_new.xml] [--envs 128]
                             [--out perf_logs/mosaic_dump.txt]
"""

import argparse
import collections
import contextlib
import io
import json
import math
import os
import re
import sys


def _tiles(shape, dtype_bits=32):
  """8x128-tile count for a vector shape (f32 sublane 8, lane 128)."""
  if not shape:
    return 1
  lanes = shape[-1]
  subl = shape[-2] if len(shape) >= 2 else 1
  rest = 1
  for d in shape[:-2]:
    rest *= d
  return rest * math.ceil(subl / 8) * math.ceil(lanes / 128)


_OP_RE = re.compile(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)\"?[\s(]")
_VEC_RE = re.compile(r"vector<([0-9x]+)x[a-z0-9]+>")


def histogram(mlir_text: str):
  ops = collections.Counter()
  tile_issues = collections.Counter()
  shapes = collections.Counter()
  for line in mlir_text.splitlines():
    mo = _OP_RE.search(line)
    if not mo:
      continue
    name = mo.group(1)
    ops[name] += 1
    vecs = _VEC_RE.findall(line)
    if vecs:
      # weight by the RESULT/operand vector tiles on the line (max —
      # elementwise ops read+write the same tiling; using max avoids
      # double-counting operands)
      t = max(_tiles([int(d) for d in v.split("x")]) for v in vecs)
      tile_issues[name] += t
      shapes[vecs[0]] += 1
  return ops, tile_issues, shapes


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="rodent_new.xml")
  ap.add_argument("--envs", type=int, default=128)
  ap.add_argument("--out", default="perf_logs/mosaic_dump.txt")
  ap.add_argument("--n-frames", type=int, default=10)
  args = ap.parse_args()

  os.environ["BRR_KDUMP"] = "1"
  import jax
  import jax.numpy as jnp
  from bench import _model_path
  from brax_rodent_run_tpu.mjcf import load_model
  from brax_rodent_run_tpu.ops import fused_full as ff

  m = load_model(_model_path(args.model), solver="cg", iterations=8,
                 ls_iterations=8)
  entry = ff.fused_steps_entry(m, args.n_frames, lean=True)
  N = args.envs
  sh = lambda *s: jax.ShapeDtypeStruct(s, jnp.float32)
  abstract = (sh(N, m.nq), sh(N, m.nv), sh(N, m.na), sh(N, m.nu),
              sh(N, m.nv))

  buf = io.StringIO()
  # pallas debug prints go to stdout at lowering time
  with contextlib.redirect_stdout(buf):
    jax.jit(jax.vmap(lambda q, v, a, c, f: entry(q, v, a, c, f))).lower(
        *abstract)
  text = buf.getvalue()
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write(text)

  # the dump may contain several modules (jaxpr + Mosaic); histogram the
  # whole capture — jaxpr lines don't match the MLIR op regex
  ops, tiles, shapes = histogram(text)
  total_ops = sum(ops.values())
  total_tiles = sum(tiles.values())
  print(f"# Mosaic dump: {len(text)} chars -> {args.out}", file=sys.stderr)
  rows = []
  for name, n in ops.most_common(40):
    rows.append({"op": name, "count": n, "tile_issues": tiles.get(name, 0)})
  print(json.dumps({
      "model": args.model, "envs": args.envs, "n_frames": args.n_frames,
      "total_ops": total_ops, "total_tile_issues": total_tiles,
      "top_ops": rows,
      "top_shapes": dict(shapes.most_common(15)),
  }))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
