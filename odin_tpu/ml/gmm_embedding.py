"""GMM-based label embedding / classification helpers.

Reference: ``odin/ml/gmm_embedding.py:91`` (`ProbabilisticEmbedding` —
per-dimension GMM binarization of continuous label scores), plus
`GMMclassifier` and `GMMThreshold` from ``odin/ml``.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from odin_tpu.ml.base import Evaluable

__all__ = ["ProbabilisticEmbedding", "GMMclassifier", "GMMThreshold"]


class ProbabilisticEmbedding:
  """Fit a small GMM per output dimension; binarize scores by the
  highest-mean component's responsibility (reference
  ``gmm_embedding.py:91``)."""

  def __init__(self, n_components_per_class: int = 2, positive_component: int = -1,
               random_state: int = 1):
    self.n_components = int(n_components_per_class)
    self.random_state = int(random_state)
    self._gmms: List = []

  def fit(self, pos: np.ndarray) -> "ProbabilisticEmbedding":
    from sklearn.mixture import GaussianMixture
    pos = np.atleast_2d(np.asarray(pos, np.float64))
    self._gmms = []
    for i in range(pos.shape[1]):
      gmm = GaussianMixture(n_components=self.n_components,
                            covariance_type="diag",
                            random_state=self.random_state)
      gmm.fit(pos[:, i:i + 1])
      self._gmms.append(gmm)
    return self

  def predict_proba(self, pos: np.ndarray) -> np.ndarray:
    """P(positive) per dimension = responsibility of the highest-mean
    component."""
    pos = np.atleast_2d(np.asarray(pos, np.float64))
    out = np.empty_like(pos)
    for i, gmm in enumerate(self._gmms):
      resp = gmm.predict_proba(pos[:, i:i + 1])
      top = int(np.argmax(gmm.means_.ravel()))
      out[:, i] = resp[:, top]
    return out

  def binarize(self, pos: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    return (self.predict_proba(pos) > threshold).astype(np.int64)

  # sklearn-ish aliases
  transform = predict_proba
  fit_transform = lambda self, x: self.fit(x).predict_proba(x)


class GMMclassifier(Evaluable):
  """One GMM per class; classify by max class-conditional likelihood."""

  @property
  def labels(self):
    return [str(c) for c in (self.classes_ if self.classes_ is not None
                             else [])]

  def __init__(self, n_components: int = 2, covariance_type: str = "diag",
               random_state: int = 1):
    self.n_components = int(n_components)
    self.covariance_type = covariance_type
    self.random_state = int(random_state)
    self.classes_: Optional[np.ndarray] = None
    self._gmms: List = []
    self._priors: Optional[np.ndarray] = None

  def fit(self, X: np.ndarray, y: np.ndarray) -> "GMMclassifier":
    from sklearn.mixture import GaussianMixture
    X = np.asarray(X)
    y = np.asarray(y).ravel()
    self.classes_ = np.unique(y)
    self._gmms = []
    priors = []
    for c in self.classes_:
      gmm = GaussianMixture(n_components=min(self.n_components,
                                             max((y == c).sum() // 2, 1)),
                            covariance_type=self.covariance_type,
                            random_state=self.random_state)
      gmm.fit(X[y == c])
      self._gmms.append(gmm)
      priors.append((y == c).mean())
    self._priors = np.log(np.asarray(priors))
    return self

  def decision_function(self, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X)
    return np.stack([g.score_samples(X) for g in self._gmms], -1) + \
        self._priors[None, :]

  def predict(self, X: np.ndarray) -> np.ndarray:
    return self.classes_[np.argmax(self.decision_function(X), -1)]

  def predict_proba(self, X: np.ndarray) -> np.ndarray:
    ll = self.decision_function(X)
    ll -= ll.max(-1, keepdims=True)
    p = np.exp(ll)
    return p / p.sum(-1, keepdims=True)


class GMMThreshold:
  """1-D GMM-derived decision threshold between two modes (the pattern the
  reference uses for energy/score thresholding)."""

  def __init__(self, n_components: int = 2, random_state: int = 1):
    self.n_components = int(n_components)
    self.random_state = int(random_state)
    self.threshold_: float = 0.0

  def fit(self, x: np.ndarray) -> "GMMThreshold":
    from sklearn.mixture import GaussianMixture
    x = np.asarray(x, np.float64).reshape(-1, 1)
    gmm = GaussianMixture(n_components=self.n_components,
                          covariance_type="diag",
                          random_state=self.random_state).fit(x)
    order = np.argsort(gmm.means_.ravel())
    hi, lo = order[-1], order[-2] if len(order) > 1 else order[-1]
    m1, m2 = gmm.means_.ravel()[lo], gmm.means_.ravel()[hi]
    s1 = np.sqrt(gmm.covariances_.ravel()[lo])
    s2 = np.sqrt(gmm.covariances_.ravel()[hi])
    # threshold at the precision-weighted midpoint
    self.threshold_ = float((m1 * s2 + m2 * s1) / (s1 + s2))
    return self

  def predict(self, x: np.ndarray) -> np.ndarray:
    return (np.asarray(x).ravel() > self.threshold_).astype(np.int64)
