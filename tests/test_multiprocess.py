"""Real multi-process distributed training (VERDICT.md r1 #4).

Spawns 2 ACTUAL processes (2 fake CPU devices each -> a 4-device global
mesh), runs `ppo.train` on a toy env through the full multi-controller
path — `jax.distributed.initialize`, `local_batch_slice` +
`host_local_array` reset-key feed, shard_map epoch over the global mesh —
and asserts both processes finish with bit-identical replicated params.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
  with socket.socket() as s:
    s.bind(("localhost", 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_identical_params(tmp_path):
  port = _free_port()
  env = dict(os.environ)
  env.update({
      "JAX_PLATFORMS": "cpu",
      "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
      "PYTHONPATH": _REPO + os.pathsep + env.get("PYTHONPATH", ""),
  })
  procs = [
      subprocess.Popen(
          [sys.executable, _WORKER, str(i), "2", str(port), str(tmp_path)],
          env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
          text=True)
      for i in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=600)
      outs.append(out)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  for p, out in zip(procs, outs):
    assert p.returncode == 0, out[-3000:]

  with open(tmp_path / "params_0.pkl", "rb") as f:
    p0 = pickle.load(f)
  with open(tmp_path / "params_1.pkl", "rb") as f:
    p1 = pickle.load(f)
  import jax
  l0 = jax.tree_util.tree_leaves(p0)
  l1 = jax.tree_util.tree_leaves(p1)
  assert len(l0) == len(l1) and len(l0) > 0
  for a, b in zip(l0, l1):
    # replicated training state must agree across processes bit-for-bit
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
