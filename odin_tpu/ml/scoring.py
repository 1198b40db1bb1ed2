"""Vector normalization + verification scoring.

Reference: ``odin/ml/scoring.py`` — `VectorNormalizer`
(centering / WCCN / unit-length / LDA, :94), `Scorer` cosine/SVM scoring
(:252), `compute_wccn/compute_class_avg/compute_within_cov` (:15-93).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["compute_within_cov", "compute_class_avg", "compute_wccn",
           "VectorNormalizer", "Scorer"]


def compute_class_avg(X: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
  """(classes, per-class mean matrix) (reference :40)."""
  classes = np.unique(y)
  means = np.stack([X[y == c].mean(0) for c in classes])
  return classes, means


def compute_within_cov(X: np.ndarray, y: np.ndarray) -> np.ndarray:
  """Within-class covariance (reference :15)."""
  classes, means = compute_class_avg(X, y)
  Xc = X - means[np.searchsorted(classes, y)]
  return (Xc.T @ Xc) / len(X)


def compute_wccn(X: np.ndarray, y: np.ndarray, epsilon: float = 1e-6) -> np.ndarray:
  """Within-class covariance normalization projection (cholesky of inverse
  within-cov) (reference :66)."""
  W = compute_within_cov(X, y)
  W = W + epsilon * np.eye(W.shape[0])
  return np.linalg.cholesky(np.linalg.inv(W))


class VectorNormalizer:
  """Chain: centering -> WCCN -> unit-length (-> LDA)
  (reference ``scoring.py:94``)."""

  def __init__(self, centering: bool = True, wccn: bool = False,
               unit_length: bool = True, lda: bool = False,
               concat: bool = False):
    self.centering = bool(centering)
    self.wccn = bool(wccn)
    self.unit_length = bool(unit_length)
    self.lda = bool(lda)
    self.concat = bool(concat)
    self.mean: Optional[np.ndarray] = None
    self.W: Optional[np.ndarray] = None
    self.lda_model = None

  def fit(self, X: np.ndarray, y: Optional[np.ndarray] = None) -> "VectorNormalizer":
    X = np.asarray(X, np.float64)
    self.mean = X.mean(0)
    if self.wccn and y is not None:
      Xc = X - self.mean
      if self.unit_length:
        Xc = Xc / np.maximum(np.linalg.norm(Xc, axis=1, keepdims=True), 1e-12)
      self.W = compute_wccn(Xc, y)
    if self.lda and y is not None:
      from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
      self.lda_model = LinearDiscriminantAnalysis()
      self.lda_model.fit(self.transform(X), y)
    return self

  def transform(self, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, np.float64)
    if self.centering and self.mean is not None:
      X = X - self.mean
    if self.unit_length:
      X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if self.W is not None:
      X = X @ self.W
      if self.unit_length:
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if self.lda_model is not None:
      X = self.lda_model.transform(X)
    return X

  def fit_transform(self, X, y=None):
    return self.fit(X, y).transform(X)


class Scorer:
  """Cosine / SVM scoring of enrolled classes vs test vectors
  (reference ``scoring.py:252``)."""

  def __init__(self, method: str = "cosine", labels=None,
               wccn: bool = True, lda: bool = False, centering: bool = True):
    assert method in ("cosine", "svm")
    self.method = method
    self.normalizer = VectorNormalizer(centering=centering, wccn=wccn,
                                       lda=lda, unit_length=True)
    self.labels = labels
    self.model = None
    self.enroll: Optional[np.ndarray] = None

  def fit(self, X: np.ndarray, y: np.ndarray) -> "Scorer":
    X = np.asarray(X)
    y = np.asarray(y).ravel()
    Xn = self.normalizer.fit(X, y).transform(X)
    self.labels, self.enroll = compute_class_avg(Xn, y)
    if self.method == "svm":
      from sklearn.svm import SVC
      self.model = SVC(kernel="linear", probability=True)
      self.model.fit(Xn, y)
    return self

  def predict_proba(self, X: np.ndarray) -> np.ndarray:
    Xn = self.normalizer.transform(np.asarray(X))
    if self.method == "svm":
      return self.model.predict_proba(Xn)
    scores = self.score(X)
    e = np.exp(scores - scores.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)

  def score(self, X: np.ndarray) -> np.ndarray:
    """(n_test, n_classes) cosine scores."""
    Xn = self.normalizer.transform(np.asarray(X))
    E = self.enroll / np.maximum(
        np.linalg.norm(self.enroll, axis=1, keepdims=True), 1e-12)
    Xu = Xn / np.maximum(np.linalg.norm(Xn, axis=1, keepdims=True), 1e-12)
    return Xu @ E.T

  def predict(self, X: np.ndarray) -> np.ndarray:
    return self.labels[np.argmax(self.score(X), axis=1)]
