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


# named legacy loaders (reference ``loaders.py:147-263``) — thin subclasses
# over the generic local-gated DataLoader
class MNIST_original(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("mnist_original", path)


class TIDIGITS(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("tidigits", path)


class FMNIST_original(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("fmnist_original", path)


class MNIST_dropout(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("mnist_dropout", path)


class FMNIST_dropout(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("fmnist_dropout", path)



class SPEECH_SAMPLES(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("speech_samples", path)


class IRIS(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("iris", path)


class CMUarctic(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("cmuarctic", path)


class MUSAN(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("musan", path)


class openSMILEsad(DataLoader):
  def __init__(self, path: Optional[str] = None):
    super().__init__("opensmilesad", path)


def load_glove(ndim: int = 100, path: Optional[str] = None):
  """GloVe word vectors as {word: (ndim,) float32} (reference
  ``loaders.py:274``).  Local-gated: expects the standard
  ``glove.6B.<ndim>d.txt`` under the data dir (no egress)."""
  path = path or os.path.join(get_data_path(), f"glove.6B.{ndim}d.txt")
  if not os.path.exists(path):
    raise FileNotFoundError(
        f"GloVe file not found at {path}; no network egress — download "
        "glove.6B and place the .txt there")
  emb = {}
  with open(path, "r", encoding="utf-8") as f:
    for line in f:
      parts = line.rstrip().split(" ")
      emb[parts[0]] = np.asarray(parts[1:], dtype="float32")
  return emb


__all__ += ["MNIST_original", "FMNIST_original", "MNIST_dropout",
            "FMNIST_dropout", "TIDIGITS", "SPEECH_SAMPLES", "IRIS",
            "CMUarctic", "MUSAN", "openSMILEsad", "load_glove"]
