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
  """Load an MJCF file with the native compiler.

  The MuJoCo interop escape hatch is opt-in (BRR_MJCF_FALLBACK=1) and
  logged — a silent fallback would make native-compiler regressions
  invisible on production paths."""
  import os
  if os.environ.get("BRR_MJCF_FALLBACK"):
    try:
      return load_xml(path, **opt_overrides)
    except Exception as e:
      print(f"[mjcf] native compiler failed on {path} ({e!r}); "
            "falling back to MuJoCo interop (BRR_MJCF_FALLBACK=1)")
      return load_mj_path(path, **opt_overrides)
  return load_xml(path, **opt_overrides)
