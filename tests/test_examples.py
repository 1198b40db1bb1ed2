"""Import-integrity of every example and benchmark script.

Catches bitrot (renamed APIs, bad imports) without paying for full runs —
the scripts' heavy work lives inside main()/run_hydra-wrapped functions
which importing does not invoke.
"""
import glob
import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    glob.glob(os.path.join(ROOT, "examples", "**", "*.py"), recursive=True) +
    glob.glob(os.path.join(ROOT, "benchmarks", "*.py")))


@pytest.mark.parametrize("path", SCRIPTS,
                         ids=[os.path.relpath(p, ROOT) for p in SCRIPTS])
def test_script_imports(path):
  sys.path.insert(0, ROOT)
  try:
    name = "script_" + os.path.basename(path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main"), f"{path} has no main()"
  finally:
    sys.path.remove(ROOT)
