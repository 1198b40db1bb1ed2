"""Legacy archive loaders (reference: ``odin/fuel/loaders.py:78-263`` —
`DataLoader` zip-from-cloud datasets: MNIST_original, TIDIGITS, MUSAN,
CMUarctic, IRIS, openSMILEsad).

This environment has no network egress, so loaders resolve from the local
data directory only: place the extracted archive (or an .npz) under
``$ODIN_TPU_HOME/datasets/<name>/`` and `load(name)` hands back a folder
`Dataset` or the arrays.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from odin_tpu.fuel.dataset import Dataset
from odin_tpu.utils import get_data_path

__all__ = ["DataLoader", "load"]

_KNOWN = {
    "mnist_original": "MNIST raw arrays",
    "tidigits": "TIDIGITS spoken-digit corpus",
    "musan": "MUSAN music/speech/noise corpus",
    "cmuarctic": "CMU Arctic speech corpus",
    "iris": "UCI iris (available offline via sklearn)",
    "opensmilesad": "openSMILE SAD model files",
}


class DataLoader:

  def __init__(self, name: str, path: Optional[str] = None):
    self.name = str(name).lower()
    self.path = path or os.path.join(get_data_path(), self.name)

  @property
  def is_available(self) -> bool:
    return os.path.exists(self.path) or \
        os.path.exists(self.path + ".npz") or self.name == "iris"

  def load(self):
    if self.name == "iris":
      from sklearn.datasets import load_iris
      d = load_iris()
      return d.data.astype("float32"), d.target.astype("int64")
    if os.path.exists(self.path + ".npz"):
      return dict(np.load(self.path + ".npz"))
    if os.path.isdir(self.path):
      return Dataset(self.path, read_only=True)
    known = f" ({_KNOWN[self.name]})" if self.name in _KNOWN else ""
    raise FileNotFoundError(
        f"corpus '{self.name}'{known} not found at {self.path}; this "
        "environment has no network egress — place the extracted archive "
        "or an .npz there")


def load(name: str, path: Optional[str] = None):
  return DataLoader(name, path).load()
