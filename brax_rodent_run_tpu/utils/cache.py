"""Persistent-compile-cache configuration shared by every entry point.

XLA:CPU AOT cache entries embed the COMPILE machine's ISA features
(amx/avx512...); loading one on a host without those features SIGILLs
the process (r5: killed the test suite at 55% after a machine change).
TPU entries are device code and are host-independent. So: CPU runs get
a cache dir fingerprinted by the host CPU's flags; TPU runs share the
plain .jax_cache that survives across round hosts.
"""

import hashlib
import os


def _cpu_fingerprint() -> str:
  try:
    with open("/proc/cpuinfo") as f:
      flags = next(l for l in f if l.startswith("flags"))
  except (OSError, StopIteration):
    import platform
    flags = platform.processor()
  return hashlib.sha1(flags.encode()).hexdigest()[:10]


def configure_cache(root: str) -> str:
  """Set jax's persistent compile cache under `root` and return the dir.
  Call BEFORE the first jit. Chooses the CPU-fingerprinted dir when the
  run targets the CPU backend (JAX_PLATFORMS mentions cpu)."""
  import jax
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    cache = os.path.join(root, f".jax_cache_cpu_{_cpu_fingerprint()}")
  else:
    cache = os.path.join(root, ".jax_cache")
  os.makedirs(cache, exist_ok=True)
  jax.config.update("jax_compilation_cache_dir", cache)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
  jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
  return cache
