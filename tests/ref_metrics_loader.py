"""Load the REFERENCE disentanglement-metric kernels (read-only, public
content) for numeric parity tests.

`odin/bay/vi/downstream_metrics.py` and `odin/bay/vi/metrics.py` are pure
numpy+scipy+sklearn at the call level, but their import headers pull
tensorflow_probability (not installable here) and various `odin.*` helpers.
This loader executes them standalone with minimal stubs — TF/TFP types are
only used in isinstance checks and annotations on the code paths under
test; `odin/ml/tree.py` (the GBT wrapper `importance_matrix` really calls)
is the REAL reference module, executed as-is (pure sklearn; xgboost is
blocked so the deterministic sklearn fallback runs, as it would upstream
without xgboost installed).
"""
import contextlib
import sys
import types

import numpy as np

REF = "/root/reference/odin/bay/vi/downstream_metrics.py"
REF_METRICS = "/root/reference/odin/bay/vi/metrics.py"
REF_TREE = "/root/reference/odin/ml/tree.py"


class _FakeDistribution:
  pass


class _fifodict(dict):
  def __init__(self, maxlen=10):
    super().__init__()


@contextlib.contextmanager
def _catch_warnings_ignore(*a, **k):
  import warnings
  with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    yield


def _exec_module(path, name):
  m = types.ModuleType(name)
  m.__file__ = path
  exec(compile(open(path).read(), path, "exec"), m.__dict__)
  return m


def _stub_modules():
  tf = types.ModuleType("tensorflow")
  tf.Tensor = type("Tensor", (), {})
  tf.nest = types.SimpleNamespace(flatten=lambda x: [x])
  tfd = types.ModuleType("tensorflow_probability.python.distributions")
  tfd.Distribution = _FakeDistribution
  tfp_python = types.ModuleType("tensorflow_probability.python")
  tfp_python.distributions = tfd
  tfp = types.ModuleType("tensorflow_probability")
  tfp.distributions = tfd
  tfp.python = tfp_python

  odin = types.ModuleType("odin")
  bay = types.ModuleType("odin.bay")
  bay_dist = types.ModuleType("odin.bay.distributions")
  bay_dist.Blockwise = type("Blockwise", (_FakeDistribution,), {})
  bay_helpers = types.ModuleType("odin.bay.helpers")
  bay_helpers.batch_slice = lambda *a, **k: None
  vi = types.ModuleType("odin.bay.vi")
  vi_utils = types.ModuleType("odin.bay.vi.utils")
  vi_utils.discretizing = lambda *a, **k: a[0]
  stats = types.ModuleType("odin.stats")
  stats.is_discrete = lambda x: np.issubdtype(np.asarray(x).dtype,
                                              np.integer)
  utils = types.ModuleType("odin.utils")
  utils.fifodict = _fifodict
  utils.catch_warnings_ignore = _catch_warnings_ignore
  utils_mpi = types.ModuleType("odin.utils.mpi")
  utils_mpi.MPI = None
  utils_mpi.get_cpu_count = lambda: 1
  ml = types.ModuleType("odin.ml")

  return {
      "tensorflow": tf,
      "tensorflow_probability": tfp,
      "tensorflow_probability.python": tfp_python,
      "tensorflow_probability.python.distributions": tfd,
      "odin": odin, "odin.bay": bay, "odin.bay.distributions": bay_dist,
      "odin.bay.helpers": bay_helpers, "odin.bay.vi": vi,
      "odin.bay.vi.utils": vi_utils, "odin.stats": stats,
      "odin.utils": utils, "odin.utils.mpi": utils_mpi, "odin.ml": ml,
      "xgboost": None,  # force the deterministic sklearn GBT fallback
  }


def load_reference_metrics():
  """Returns (downstream_metrics_module, metrics_module) of the reference,
  executed with stubs."""
  stubs = _stub_modules()
  saved = {k: sys.modules.get(k) for k in stubs}
  saved["odin.ml.tree"] = sys.modules.get("odin.ml.tree")
  saved["odin.bay.vi.downstream_metrics"] = sys.modules.get(
      "odin.bay.vi.downstream_metrics")
  sys.modules.update(stubs)
  try:
    tree = _exec_module(REF_TREE, "odin.ml.tree")
    sys.modules["odin.ml.tree"] = tree
    dm = _exec_module(REF, "odin.bay.vi.downstream_metrics")
    sys.modules["odin.bay.vi.downstream_metrics"] = dm
    metrics = _exec_module(REF_METRICS, "ref_vi_metrics")
  finally:
    for k, v in saved.items():
      if v is None:
        sys.modules.pop(k, None)
      else:
        sys.modules[k] = v
  return dm, metrics
