"""Experiment manager — config overrides, hashed output dirs, multirun.

Reference: ``odin/training/experimenter.py:154-186,245-446`` — `run_hydra`
decorator: yaml/dict/CLI config with `--reset`/`--override`/`-j N` multirun,
per-experiment output dirs keyed by the md5 `hash_config` of overrides.

hydra-core is not available offline; this implements the same surface on a
small dataclass/dict config system (yaml via a minimal parser when pyyaml is
absent).
"""
from __future__ import annotations

import copy
import itertools
import os
import shutil
import sys
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

from odin_tpu.utils import md5_checksum

__all__ = ["parse_config", "hash_config", "run_hydra", "get_output_dir"]


def _parse_value(v: str) -> Any:
  v = v.strip()
  for cast in (int, float):
    try:
      return cast(v)
    except ValueError:
      pass
  if v.lower() in ("true", "false"):
    return v.lower() == "true"
  if v.lower() in ("null", "none"):
    return None
  if "," in v:
    return [_parse_value(x) for x in v.split(",")]
  return v


def parse_config(config: Union[str, dict, None]) -> Dict[str, Any]:
  """Config from dict, yaml file path, or yaml-ish string
  (reference `parse_config`)."""
  if config is None:
    return {}
  if isinstance(config, dict):
    return dict(config)
  text = config
  if os.path.isfile(config):
    with open(config) as f:
      text = f.read()
  try:
    import yaml
    return yaml.safe_load(text) or {}
  except ImportError:
    out: Dict[str, Any] = {}
    for line in text.splitlines():
      line = line.split("#")[0].strip()
      if not line or ":" not in line:
        continue
      k, v = line.split(":", 1)
      out[k.strip()] = _parse_value(v)
    return out


def hash_config(overrides: Dict[str, Any], exclude: Sequence[str] = ()) -> str:
  """md5 of the sorted override items (reference `hash_config`)."""
  items = sorted((k, v) for k, v in overrides.items() if k not in exclude)
  return md5_checksum(repr(items).encode())[:8]


def get_output_dir(root: str, overrides: Dict[str, Any]) -> str:
  name = "_".join(f"{k}={v}" for k, v in sorted(overrides.items()))
  if len(name) > 80 or not name:
    name = hash_config(overrides)
  return os.path.join(root, name)


def _parse_cli(argv: Sequence[str]):
  overrides: Dict[str, Any] = {}
  flags = {"reset": False, "jobs": 1}
  for arg in argv:
    if arg == "--reset":
      flags["reset"] = True
    elif arg.startswith("-j"):
      flags["jobs"] = int(arg[2:] or 1)
    elif "=" in arg:
      k, v = arg.split("=", 1)
      overrides[k.lstrip("-")] = _parse_value(v)
  return overrides, flags


def _run_one(task_fn: Callable, base: Dict[str, Any], output_dir: str,
             reset: bool, ov: Dict[str, Any]):
  """Execute one sweep point in its own hashed output dir."""
  cfg = copy.deepcopy(base)
  cfg.update(ov)
  out_dir = get_output_dir(output_dir, ov)
  if reset and os.path.exists(out_dir):
    shutil.rmtree(out_dir)
  os.makedirs(out_dir, exist_ok=True)
  cfg["output_dir"] = out_dir
  return task_fn(_Namespace(cfg))


def run_hydra(output_dir: str = "./results",
              config: Union[str, dict, None] = None,
              exclude_keys: Sequence[str] = ()):
  """Decorator: `@run_hydra(output_dir=...)` wraps a main(cfg) function.

  CLI: ``python main.py key=value key2=v1,v2 --reset -j2`` — list-valued
  overrides trigger a multirun sweep over the cartesian product (the
  reference's `-m` behaviour); each run gets its own hashed output dir in
  `cfg.output_dir`.
  """

  def decorator(task_fn: Callable):
    def wrapped(argv: Optional[Sequence[str]] = None, **extra):
      base = parse_config(config)
      overrides, flags = _parse_cli(
          argv if argv is not None else sys.argv[1:])
      overrides.update(extra)
      # multirun expansion: any list-valued override sweeps
      sweep_keys = [k for k, v in overrides.items() if isinstance(v, list)]
      combos = [dict(overrides)]
      if sweep_keys:
        values = [overrides[k] for k in sweep_keys]
        combos = []
        for combo in itertools.product(*values):
          d = dict(overrides)
          d.update(dict(zip(sweep_keys, combo)))
          combos.append(d)
      n_jobs = max(1, int(flags["jobs"]))
      if n_jobs > 1 and len(combos) > 1:
        # reference `-j N` multirun (``experimenter.py:245-446``): run the
        # sweep in a process pool.  Forked workers inherit the interpreter
        # state — initialize JAX inside task_fn, not before the sweep.
        import functools
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        with ctx.Pool(min(n_jobs, len(combos))) as pool:
          results = pool.map(
              functools.partial(_run_one, task_fn, base, output_dir,
                                flags["reset"]), combos)
      else:
        results = [_run_one(task_fn, base, output_dir, flags["reset"], ov)
                   for ov in combos]
      return results[0] if len(results) == 1 else results

    wrapped.__name__ = task_fn.__name__
    return wrapped

  return decorator


class _Namespace(dict):
  """dict with attribute access (hydra OmegaConf-lite)."""

  def __getattr__(self, k):
    try:
      return self[k]
    except KeyError as e:
      raise AttributeError(k) from e

  def __setattr__(self, k, v):
    self[k] = v
