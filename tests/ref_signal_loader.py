"""Load the REFERENCE NumPy DSP module (read-only, public content) for
bit-exactness comparisons.  The reference imports `odin.utils` cache
decorators and has a numpy-2.x incompatibility in `mel_filters` (np.linspace
over shape-(1,) endpoints); both are patched here without modifying the
reference tree."""
import importlib.util  # noqa: F401 (kept for API parity)
import sys
import types

import numpy as np

REF_PATH = "/root/reference/odin/preprocessing/signal.py"


def load_reference_signal():
  def cache_stub(*args, **kw):
    if len(args) == 1 and callable(args[0]):
      return args[0]
    def deco(f):
      return f
    return deco

  fake_utils = types.ModuleType("odin.utils")
  fake_utils.cache_memory = cache_stub
  fake_utils.cache_disk = cache_stub
  fake_odin = types.ModuleType("odin")
  fake_odin.utils = fake_utils
  saved = {k: sys.modules.get(k) for k in ("odin", "odin.utils")}
  sys.modules["odin"] = fake_odin
  sys.modules["odin.utils"] = fake_utils
  try:
    # numpy 2.x compatibility: list-based fancy indexing in `delta` must be
    # a tuple (pure syntax fix, semantics unchanged)
    src = open(REF_PATH).read().replace("delta_x = delta_x[idx]",
                                        "delta_x = delta_x[tuple(idx)]")
    m = types.ModuleType("ref_signal")
    m.__file__ = REF_PATH
    exec(compile(src, REF_PATH, "exec"), m.__dict__)
  finally:
    for k, v in saved.items():
      if v is None:
        sys.modules.pop(k, None)
      else:
        sys.modules[k] = v
  # numpy 2.x fix: hz2mel returns shape-(1,) for scalars; linspace over
  # those endpoints produces a 2-D grid inside the reference mel_filters.
  ref_hz2mel = m.hz2mel

  def hz2mel_fixed(frequencies):
    out = ref_hz2mel(frequencies)
    if np.isscalar(frequencies) or np.ndim(frequencies) == 0:
      return float(np.asarray(out).ravel()[0])
    return out

  m.hz2mel = hz2mel_fixed
  return m
