"""Disentanglement metric kernels.

Reference: ``odin/bay/vi/metrics.py`` — `mutual_info_gap` (:430-454),
`discrete_mutual_info/entropy` (:316,340), `mutual_info_estimate` (:362),
`correlation_matrix` (:66), `unsupervised_clustering_scores` (:211),
`relative_strength` (:456), `Correlation` IntFlag (:476).
"""
from __future__ import annotations

import warnings
from enum import IntFlag, auto
from typing import Optional, Union

import numpy as np

__all__ = [
    "Correlation", "discrete_mutual_info", "discrete_entropy",
    "mutual_info_estimate", "mutual_info_gap", "correlation_matrix",
    "relative_strength", "unsupervised_clustering_scores",
]


class Correlation(IntFlag):
  """Correlation estimator flags (reference ``metrics.py:476``)."""

  Pearson = auto()
  Spearman = auto()
  Lasso = auto()
  MutualInfo = auto()
  Importance = auto()


def discrete_mutual_info(codes: np.ndarray, factors: np.ndarray) -> np.ndarray:
  """[n_codes, n_factors] discrete MI matrix (reference :316)."""
  from sklearn.metrics import mutual_info_score
  codes = np.atleast_2d(codes)
  factors = np.atleast_2d(factors)
  m = np.zeros([codes.shape[1], factors.shape[1]])
  for i in range(codes.shape[1]):
    for j in range(factors.shape[1]):
      m[i, j] = mutual_info_score(factors[:, j], codes[:, i])
  return m


def discrete_entropy(labels: np.ndarray) -> np.ndarray:
  """Columnwise discrete entropy (reference :340)."""
  labels = np.atleast_1d(labels)

  def _h(col):
    _, counts = np.unique(col, return_counts=True)
    p = counts / counts.sum()
    return -np.sum(p * np.log(p))

  if labels.ndim == 1:
    return _h(labels)
  return np.array([_h(labels[:, j]) for j in range(labels.shape[1])])


def mutual_info_estimate(representations: np.ndarray,
                         factors: np.ndarray,
                         continuous_latents: bool = True,
                         continuous_factors: bool = False,
                         n_neighbors: int = 3,
                         seed: int = 1) -> np.ndarray:
  """kNN MI estimator matrix [n_latents, n_factors] (reference :362)."""
  from sklearn.feature_selection import (mutual_info_classif,
                                         mutual_info_regression)
  mi_fn = mutual_info_regression if continuous_factors else mutual_info_classif
  out = np.empty((representations.shape[1], factors.shape[1]))
  for j in range(factors.shape[1]):
    out[:, j] = mi_fn(representations, factors[:, j],
                      discrete_features=not continuous_latents,
                      n_neighbors=n_neighbors, random_state=seed)
  return out


def mutual_info_gap(representations: np.ndarray,
                    factors: np.ndarray) -> float:
  """MIG (Chen et al. 2019; reference :430-454): normalized gap between the
  two largest MIs per factor.  Inputs must be DISCRETIZED."""
  representations = np.atleast_2d(representations).astype(np.int64)
  factors = np.atleast_2d(factors).astype(np.int64)
  m = discrete_mutual_info(representations, factors)
  sorted_m = np.sort(m, axis=0)[::-1]
  h = discrete_entropy(factors)
  return float(np.mean((sorted_m[0, :] - sorted_m[1, :]) /
                       np.maximum(h, 1e-12)))


def correlation_matrix(x: np.ndarray, y: np.ndarray,
                       method: str = "spearman",
                       seed: int = 1) -> np.ndarray:
  """[x_dim, y_dim] correlation matrix (reference :66);
  method in {'spearman', 'pearson', 'lasso', 'mutualinfo', 'importance'}."""
  import scipy.stats
  x = np.asarray(x)
  y = np.asarray(y)
  method = str(method).lower()
  nx, ny = x.shape[1], y.shape[1]
  mat = np.zeros((nx, ny))
  if method == "spearman":
    for i in range(nx):
      for j in range(ny):
        mat[i, j] = scipy.stats.spearmanr(x[:, i], y[:, j]).statistic
  elif method == "pearson":
    for i in range(nx):
      for j in range(ny):
        mat[i, j] = scipy.stats.pearsonr(x[:, i], y[:, j]).statistic
  elif method == "lasso":
    from sklearn.linear_model import Lasso
    model = Lasso(random_state=seed, alpha=0.05)
    model.fit(x, y)
    mat = np.atleast_2d(model.coef_).T.reshape(nx, ny)
  elif method in ("mutualinfo", "mi"):
    mat = mutual_info_estimate(x, y)
  elif method == "importance":
    from odin_tpu.bay.vi.downstream_metrics import importance_matrix
    mat = importance_matrix(x, y)[0]
  else:
    raise ValueError(f"unknown correlation method '{method}'")
  return np.nan_to_num(mat)


def relative_strength(mat: np.ndarray) -> float:
  """Mean max^2/sum along both axes of a correlation matrix
  (reference :456)."""
  mat = np.abs(np.asarray(mat))
  with warnings.catch_warnings():
    warnings.filterwarnings("ignore", category=RuntimeWarning)
    sx = np.mean(np.nan_to_num(np.max(mat, 0) ** 2 / np.sum(mat, 0), nan=0.0))
    sy = np.mean(np.nan_to_num(np.max(mat, 1) ** 2 / np.sum(mat, 1), nan=0.0))
  return float((sx + sy) / 2)


def unsupervised_clustering_scores(factors: np.ndarray,
                                   representations: Optional[np.ndarray] = None,
                                   predictions: Optional[np.ndarray] = None,
                                   algorithm: str = "both",
                                   random_state: int = 1) -> dict:
  """ARI/AMI/NMI/ASW of KMeans (or GMM) clusterings of the representations
  against a single factor labelling (reference :211)."""
  from sklearn.cluster import KMeans
  from sklearn.metrics import (adjusted_mutual_info_score,
                               adjusted_rand_score,
                               normalized_mutual_info_score,
                               silhouette_score)
  factors = np.asarray(factors).ravel()
  n_clusters = len(np.unique(factors))
  if predictions is None:
    assert representations is not None
    km = KMeans(n_clusters=n_clusters, n_init=4, random_state=random_state)
    predictions = km.fit_predict(representations)
  out = dict(
      ari=float(adjusted_rand_score(factors, predictions)),
      ami=float(adjusted_mutual_info_score(factors, predictions)),
      nmi=float(normalized_mutual_info_score(factors, predictions)),
  )
  if representations is not None and n_clusters > 1:
    try:
      out["asw"] = float(silhouette_score(representations, factors))
    except Exception:
      out["asw"] = 0.0
  return out
