"""Progbar — progress tracking with per-key reports.

Reference: ``odin/utils/progbar.py:90`` — a rich progress bar tracking named
counters/values with throughput; here a tqdm-backed equivalent with the
`add_value`/`report` surface.
"""
from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, Optional

__all__ = ["Progbar"]


class Progbar:

  def __init__(self, target: Optional[int] = None, name: str = "",
               print_report: bool = True, interval: float = 1.0,
               unit: str = "it"):
    self.target = target
    self.name = name
    self.print_report = print_report
    self.interval = float(interval)
    self.seen = 0
    self._start = time.time()
    self._last_print = 0.0
    self._values: Dict[str, list] = defaultdict(list)
    try:
      from tqdm import tqdm
      self._bar = tqdm(total=target, desc=name, unit=unit,
                       disable=not print_report)
    except ImportError:
      self._bar = None

  def add_value(self, key: str, value: float) -> "Progbar":
    self._values[key].append(float(value))
    return self

  def __setitem__(self, key, value):
    self.add_value(key, value)

  def add(self, n: int = 1, **values) -> "Progbar":
    for k, v in values.items():
      self.add_value(k, v)
    self.seen += n
    if self._bar is not None:
      self._bar.update(n)
      now = time.time()
      if now - self._last_print >= self.interval and self._values:
        self._bar.set_postfix({k: f"{v[-1]:.4g}"
                               for k, v in self._values.items()})
        self._last_print = now
    return self

  update = add

  @property
  def throughput(self) -> float:
    return self.seen / max(time.time() - self._start, 1e-9)

  def report(self) -> Dict[str, float]:
    """Mean of every tracked value (reference per-key reports)."""
    import numpy as np
    return {k: float(np.mean(v)) for k, v in self._values.items()}

  def close(self):
    if self._bar is not None:
      self._bar.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
