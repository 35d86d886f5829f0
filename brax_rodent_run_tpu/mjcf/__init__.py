"""MJCF front-end: compile model descriptions into the immutable Model.

Two paths:
- ``compiler.load_model`` (native): our own MJCF parser/compiler — no
  MuJoCo dependency (default once feature-complete).
- ``from_mj.load_mj_path`` (interop): route through an installed MuJoCo C
  compiler; also the ground truth our native compiler is tested against.
"""

from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model, load_mj_path


def load_model(path: str, **opt_overrides):
  """Load an MJCF file. Prefers the native compiler; falls back to the
  MuJoCo interop path for constructs the native compiler doesn't cover yet.
  """
  try:
    from brax_rodent_run_tpu.mjcf.compiler import load_model as native
    return native(path, **opt_overrides)
  except Exception:
    return load_mj_path(path, **opt_overrides)
