"""Gene-expression datasets (reference: ``odin/fuel/bio_data/``).

`GeneDataset` base (reference ``bio_data/_base.py:23``); Cortex/PBMC load
from local .npz (no egress); `SyntheticGenes` generates ZINB-distributed
counts with cell-type structure for scVI-style model tests.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from odin_tpu.fuel.dataset_base import IterableDataset, get_partition
from odin_tpu.utils import get_data_path

__all__ = ["GeneDataset", "Cortex", "PBMC", "SyntheticGenes",
           "Melanoma", "Forebrain", "Insilico", "BreastTumor", "Leukemia",
           "HumanEmbryos", "SyntheticATAC"]


class GeneDataset(IterableDataset):

  @property
  def data_type(self):
    return "gene"


class _NPZGene(GeneDataset):
  _name = ""
  _n_genes = 0
  _labels: List[str] = []

  def __init__(self, path: Optional[str] = None, seed: int = 1):
    super().__init__(seed=seed)
    self.path = path or os.path.join(get_data_path(), f"{self._name}.npz")
    self._cache = None

  @property
  def name(self):
    return self._name

  @property
  def shape(self):
    return (self._n_genes,)

  @property
  def labels(self):
    return list(self._labels)

  def _load(self, partition: str):
    if self._cache is None:
      if not os.path.exists(self.path):
        raise FileNotFoundError(
            f"dataset '{self._name}' not found at {self.path} (no network "
            "egress — use SyntheticGenes for testing)")
      self._cache = dict(np.load(self.path))
    arr = self._cache
    x, y = arr["x"], arr.get("y")
    n = len(x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return x[sl], (y[sl] if y is not None else None)


class Cortex(_NPZGene):
  """Mouse cortex scRNA-seq (reference ``bio_data``)."""
  _name = "cortex"
  _n_genes = 558
  _labels = ["astrocytes_ependymal", "endothelial-mural", "interneurons",
             "microglia", "oligodendrocytes", "pyramidal CA1",
             "pyramidal SS"]


class PBMC(_NPZGene):
  _name = "pbmc"
  _n_genes = 1000
  _labels = ["B cells", "CD4 T", "CD8 T", "NK cells"]


class SyntheticGenes(GeneDataset):
  """ZINB count matrix with latent cell types."""

  def __init__(self, n_cells: int = 2000, n_genes: int = 200,
               n_types: int = 4, seed: int = 1):
    super().__init__(seed=seed)
    rng = np.random.RandomState(seed)
    self.n_genes = int(n_genes)
    self.n_types = int(n_types)
    means = rng.gamma(2.0, 2.0, size=(n_types, n_genes))
    types = rng.randint(0, n_types, n_cells)
    mu = means[types] * rng.lognormal(0, 0.3, size=(n_cells, 1))
    theta = 2.0
    p = mu / (mu + theta)
    counts = rng.negative_binomial(theta, 1 - p)
    dropout = rng.rand(n_cells, n_genes) < 0.3
    counts = np.where(dropout, 0, counts)
    self._x = counts.astype("float32")
    self._y = types.astype("int64")

  @property
  def name(self):
    return "syntheticgenes"

  @property
  def shape(self):
    return (self.n_genes,)

  @property
  def labels(self):
    return [f"type{i}" for i in range(self.n_types)]

  def _load(self, partition: str):
    n = len(self._x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return self._x[sl], self._y[sl]


# ---------------------------------------------------------------------------
# Single-cell ATAC-seq (reference ``odin/fuel/bio_data/atac_datasets.py``)
# ---------------------------------------------------------------------------
class _NPZAtac(_NPZGene):
  """Binary chromatin-accessibility matrices.  The reference downloads
  R-data archives and converts them via rpy2 (atac_datasets.py:34); with no
  egress the converted ``{x, y, labels_name}`` npz cache is loaded instead,
  and :class:`SyntheticATAC` covers testing."""

  @property
  def data_type(self):
    return "atac"

  @property
  def labels(self):
    if self._cache is not None and "labels_name" in self._cache:
      return [str(s) for s in self._cache["labels_name"]]
    return list(self._labels)


class Melanoma(_NPZAtac):
  """Melanoma scATAC (Bravo González-Blas et al. 2019; reference :22)."""
  _name = "melanoma_atac"
  _labels = ["MM001_proliferative", "MM011_proliferative",
             "MM031_proliferative", "MM047_invasive", "MM057_proliferative",
             "MM074_proliferative", "MM087_proliferative", "MM099_invasive"]


class Forebrain(_NPZAtac):
  _name = "forebrain_atac"
  _labels = []


class Insilico(_NPZAtac):
  _name = "insilico_atac"
  _labels = []


class BreastTumor(_NPZAtac):
  _name = "breast_tumor_atac"
  _labels = []


class Leukemia(_NPZAtac):
  _name = "leukemia_atac"
  _labels = []


class HumanEmbryos(_NPZGene):
  """scRNA-seq of human pre-implantation embryos (reference
  ``bio_data/human_embryos.py:10``)."""
  _name = "human_embryos"
  _labels = ["E3", "E4", "E5", "E6", "E7"]


class SyntheticATAC(GeneDataset):
  """Binary accessibility counts from a latent topic model (cisTopic's
  generative assumptions): cell topic mixtures x topic-region profiles ->
  Bernoulli peaks.  Offline stand-in for the ATAC family."""

  def __init__(self, n_cells: int = 2000, n_regions: int = 300,
               n_topics: int = 5, seed: int = 1):
    super().__init__(seed=seed)
    rng = np.random.RandomState(seed)
    self.n_regions = int(n_regions)
    self.n_topics = int(n_topics)
    profiles = rng.dirichlet(np.full(n_regions, 0.1), size=n_topics)
    types = rng.randint(0, n_topics, n_cells)
    theta = rng.dirichlet(np.full(n_topics, 0.3), size=n_cells)
    theta = 0.7 * np.eye(n_topics)[types] + 0.3 * theta
    rate = theta @ profiles * n_regions * 0.5
    self._x = (rng.rand(n_cells, n_regions) <
               (1 - np.exp(-rate))).astype("float32")
    self._y = types.astype("int64")

  @property
  def name(self):
    return "syntheticatac"

  @property
  def data_type(self):
    return "atac"

  @property
  def shape(self):
    return (self.n_regions,)

  @property
  def labels(self):
    return [f"topic{i}" for i in range(self.n_topics)]

  def _load(self, partition: str):
    n = len(self._x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return self._x[sl], self._y[sl]
