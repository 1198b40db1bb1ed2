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


# ---------------------------------------------------------------------------
# HGNC human-genome annotation table
# ---------------------------------------------------------------------------
_HGNC_HEADER = [
    "hgnc_id", "symbol", "name", "locus_group", "locus_type", "status",
    "location", "location_sortable", "alias_symbol", "alias_name",
    "prev_symbol", "prev_name", "gene_family", "gene_family_id",
    "date_approved_reserved", "date_symbol_changed", "date_name_changed",
    "date_modified", "entrez_id", "ensembl_gene_id", "vega_id", "ucsc_id",
    "ena", "refseq_accession", "ccds_id", "uniprot_ids", "pubmed_id",
    "mgd_id", "rgd_id", "lsdb", "cosmic", "omim_id", "mirbase", "homeodb",
    "snornabase", "bioparadigms_slc", "orphanet", "pseudogene.org",
    "horde_id", "merops", "imgt", "iuphar", "kznf_gene_catalog",
    "mamit-trnadb", "cd", "lncrnadb", "enzyme_id",
    "intermediate_filament_db", "rna_central_ids", "lncipedia", "gtrnadb",
    "agr",
]
_HGNC_FILTERED = ["ensembl_gene_id", "name", "symbol", "alias_symbol",
                  "alias_name", "locus_type", "location", "cd",
                  "uniprot_ids", "enzyme_id"]
_HGNC_CHROMOSOMES = [str(i) for i in range(1, 23)] + ["X", "Y", "Mitochondria"]


class HumanGenome:
  """HGNC gene-annotation table (reference
  ``odin/fuel/bio_data/human_genome.py:95`` `HumanGenome`): lookup of gene
  symbol/ensembl-id/CD-marker/locus metadata, e.g. for labeling scRNA-seq
  features.

  The reference downloads per-chromosome TSVs from the HGNC FTP on first
  use; this environment has no egress, so `path` must already contain those
  files (``protein-coding_gene_chr_<c>.txt`` / ``non-coding_RNA_chr_<c>.txt``
  — the exact names the reference caches) or a prebuilt table can be passed
  via `table` (a DataFrame or a TSV path with the 52-column HGNC header).
  """

  def __init__(self, path: str = "~/human_genome", table=None):
    import pandas as pd
    frames = []
    if table is not None:
      if isinstance(table, str):
        table = self._read_tsv(table)
      frames.append(self._filter(table, chromosome=None))
    else:
      path = os.path.abspath(os.path.expanduser(path))
      if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} does not exist and this environment has no network "
            "egress: place the HGNC per-chromosome TSVs there (see "
            "genenames.org statistics-and-files) or pass `table=`")
      for chro in _HGNC_CHROMOSOMES:
        for kind in ("protein-coding_gene", "non-coding_RNA"):
          fpath = os.path.join(path, f"{kind}_chr_{chro}.txt")
          if os.path.exists(fpath):
            frames.append(self._filter(self._read_tsv(fpath),
                                       chromosome=str(chro).capitalize()))
      if not frames:
        raise FileNotFoundError(f"no HGNC TSV files found under {path}")
    self.db = pd.concat(frames, ignore_index=True)
    self.unique_index = {
        col: {v for v in self.db[col].unique() if len(str(v)) > 0}
        for col in self.header
    }

  @staticmethod
  def _read_tsv(fpath):
    import pandas as pd
    rows = []
    with open(fpath, "r") as f:
      for line in f:
        rows.append([c.replace('"', "") for c in line.rstrip("\n").split("\t")])
    data = np.asarray(rows, dtype=object)
    assert data.shape[1] == len(_HGNC_HEADER), \
        f"expected {len(_HGNC_HEADER)} HGNC columns, got {data.shape[1]}"
    assert list(data[0]) == _HGNC_HEADER, f"unknown header: {data[0][:5]}..."
    return pd.DataFrame(data[1:], columns=data[0])

  @staticmethod
  def _filter(df, chromosome):
    df = df[_HGNC_FILTERED].copy()
    if chromosome is not None:
      df["chromosome"] = chromosome
    elif "chromosome" not in df.columns:
      df["chromosome"] = ""
    return df

  @property
  def header(self):
    return self.db.columns.to_numpy()

  def unique(self, column_name):
    return sorted(self.unique_index[column_name])

  def __contains__(self, key) -> bool:
    try:
      self[key]
      return True
    except KeyError:
      return False

  def __getitem__(self, key):
    """Rows matching a value in ANY column (string key) or the conjunction
    of column=value constraints (dict / list-of-pairs key)."""
    if isinstance(key, (tuple, list, np.ndarray)):
      if not isinstance(key[0], (tuple, list, np.ndarray)):
        key = [key]
      key = dict(key)
    if isinstance(key, str):
      for col, values in self.unique_index.items():
        if key in values:
          return self.db[self.db[col] == key]
      raise KeyError(f"Cannot find gene with key info: {key}")
    if isinstance(key, dict):
      db = self.db
      for col, val in key.items():
        db = db[db[str(col)] == str(val)]
      if db.shape[0] == 0:
        raise KeyError(f"No gene matches {key}")
      return db
    raise KeyError(f"key can be dict or string, given: {type(key)}")

  def _get(self, key, column) -> str:
    df = self[key]
    assert df.shape[0] == 1, f"Found multiple entries for key='{key}'"
    return str(df[str(column)].to_numpy()[0])

  def get_chromosome(self, key) -> str:
    return self._get(key, "chromosome")

  def get_locus_type(self, key) -> str:
    return self._get(key, "locus_type")

  def get_protein_cd(self, key) -> str:
    return self._get(key, "cd")

  def get_protein_id(self, key) -> str:
    return self._get(key, "uniprot_ids")

  def get_gene_symbol(self, key) -> str:
    return self._get(key, "symbol")

  def get_gene_id(self, key) -> str:
    return self._get(key, "ensembl_gene_id")

  def get_gene_name(self, key) -> str:
    return self._get(key, "name")

  def is_cd_gene(self, key) -> bool:
    if key not in self:
      return False
    return len(self.get_protein_cd(key)) > 0

  def __repr__(self):
    return (f"HumanGenome(genes={self.db.shape[0]}, "
            f"columns={list(self.header)})")


__all__.append("HumanGenome")
