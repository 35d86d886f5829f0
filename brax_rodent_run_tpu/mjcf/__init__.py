"""MJCF front-end: compile model descriptions into the immutable Model.

Two paths:
- ``parser.load_xml`` (native, default): our own MJCF parser/compiler —
  no MuJoCo dependency. Validated array-for-array against the MuJoCo C
  compiler for every reference model (tests/test_parser.py).
- ``from_mj.load_mj_path`` (interop): route through an installed MuJoCo C
  compiler; also the ground truth the native compiler is tested against.
"""

from brax_rodent_run_tpu.mjcf.from_mj import from_mj_model, load_mj_path
from brax_rodent_run_tpu.mjcf.parser import load_xml, load_xml_string


def load_model(path: str, **opt_overrides):
  """Load an MJCF file with the native compiler; fall back to the MuJoCo
  interop path for constructs the native compiler doesn't cover yet."""
  try:
    return load_xml(path, **opt_overrides)
  except Exception:
    return load_mj_path(path, **opt_overrides)
