"""Device-mesh and multi-host utilities (SURVEY.md §7 step 6).

The reference scales with brax's single-host ``jax.pmap`` over NCCL
(slurm.py:14-18, SURVEY.md §5 "Distributed communication backend"); the
TPU-native equivalent is a single jit/shard_map program over a
``jax.sharding.Mesh`` spanning the slice: ``jax.distributed.initialize``
per host, env/data axis sharded over every chip, params replicated, grad
``pmean`` lowering to ICI all-reduce (DCN across slices is handled by the
same collectives on a multi-slice mesh).

All helpers work identically on the CPU fake-device backend
(``--xla_force_host_platform_device_count=N``) used by the tests and the
driver's multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
  """Multi-host init. On TPU pods all args are auto-detected from the
  environment; explicit args support CPU/GPU test rigs."""
  kwargs = {}
  if coordinator:
    kwargs["coordinator_address"] = coordinator
  if num_processes is not None:
    kwargs["num_processes"] = num_processes
  if process_id is not None:
    kwargs["process_id"] = process_id
  jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: int = 0,
              devices: Optional[Sequence[jax.Device]] = None,
              axis: str = DATA_AXIS) -> Mesh:
  """1-D data mesh over all (global) devices, the parallelism the tiny-MLP
  PPO workload wants (SURVEY.md §2.3: DP-over-envs + DP-over-chips;
  no TP/PP)."""
  devs = list(devices if devices is not None else jax.devices())
  if num_devices:
    devs = devs[:num_devices]
  return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
  """Shard leading (env/batch) dim over the mesh."""
  return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def local_batch_slice(mesh: Mesh, global_batch: int,
                      axis: str = DATA_AXIS) -> slice:
  """This process's slice of a globally-sharded leading batch dim.

  Hosts feed only their addressable shard (SURVEY.md §5: envs sharded over
  hosts feeding a replicated learner)."""
  n = mesh.shape[axis]
  assert global_batch % n == 0, (global_batch, n)
  per_dev = global_batch // n
  local = [d for d in mesh.devices.flat if
           d.process_index == jax.process_index()]
  if not local:
    return slice(0, 0)
  idx = sorted(np.where(np.isin(mesh.devices.flat, local))[0])
  return slice(int(idx[0]) * per_dev, (int(idx[-1]) + 1) * per_dev)


def host_local_array(mesh: Mesh, global_shape, local_np,
                     axis: str = DATA_AXIS) -> jax.Array:
  """Assemble a global jax.Array from this host's shard (multi-host feed
  path; on single host this is just device_put with the sharding)."""
  sharding = data_sharding(mesh, axis)
  return jax.make_array_from_process_local_data(
      sharding, np.asarray(local_np), global_shape)
