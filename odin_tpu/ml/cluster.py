"""Clustering: XLA k-means + sklearn-dispatch helpers.

Reference: ``odin/ml/cluster.py`` — `fast_kmeans`/`fast_knn`/`fast_dbscan`
with cuml -> sklearn fallback (:141,218,299); here the accelerated path is
an XLA Lloyd's-iteration k-means (batched distance matmuls) instead of cuml.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["KMeansJax", "fast_kmeans", "fast_knn", "fast_dbscan"]


class KMeansJax:
  """Lloyd's algorithm with k-means++ init; one jitted update step."""

  def __init__(self, n_clusters: int = 8, n_iter: int = 50, tol: float = 1e-5,
               random_state: int = 1):
    self.n_clusters = int(n_clusters)
    self.n_iter = int(n_iter)
    self.tol = float(tol)
    self.random_state = int(random_state)
    self.cluster_centers_: Optional[np.ndarray] = None

  def _init_centers(self, X, rng):
    n = len(X)
    centers = [X[rng.randint(n)]]
    for _ in range(1, self.n_clusters):
      d2 = np.min(
          ((X[:, None, :] - np.asarray(centers)[None]) ** 2).sum(-1), axis=1)
      p = d2 / max(d2.sum(), 1e-12)
      centers.append(X[rng.choice(n, p=p)])
    return np.stack(centers)

  def fit(self, X: np.ndarray) -> "KMeansJax":
    X = np.asarray(X, np.float32)
    rng = np.random.RandomState(self.random_state)
    centers = jnp.asarray(self._init_centers(X, rng))
    Xj = jnp.asarray(X)

    @jax.jit
    def step(centers):
      d = (jnp.sum(Xj * Xj, 1)[:, None] - 2 * Xj @ centers.T +
           jnp.sum(centers * centers, 1)[None])
      assign = jnp.argmin(d, axis=1)
      onehot = jax.nn.one_hot(assign, self.n_clusters, dtype=Xj.dtype)
      counts = onehot.sum(0)[:, None]
      new = (onehot.T @ Xj) / jnp.maximum(counts, 1.0)
      new = jnp.where(counts > 0, new, centers)
      return new, assign

    for _ in range(self.n_iter):
      new, assign = step(centers)
      if float(jnp.max(jnp.abs(new - centers))) < self.tol:
        centers = new
        break
      centers = new
    self.cluster_centers_ = np.asarray(centers)
    self.labels_ = np.asarray(assign)
    return self

  def predict(self, X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, np.float32)
    d = ((X[:, None, :] - self.cluster_centers_[None]) ** 2).sum(-1)
    return np.argmin(d, axis=1)

  def fit_predict(self, X):
    return self.fit(X).labels_


def fast_kmeans(X, *, n_clusters: int = 8, max_iter: int = 50,
                random_state: int = 1, framework: str = "jax", **kwargs):
  """k-means with accelerated ('jax') or sklearn backend
  (reference ``cluster.py:141``)."""
  if framework == "jax":
    return KMeansJax(n_clusters=n_clusters, n_iter=max_iter,
                     random_state=random_state).fit(np.asarray(X))
  from sklearn.cluster import KMeans
  return KMeans(n_clusters=n_clusters, max_iter=max_iter,
                random_state=random_state, n_init=4, **kwargs).fit(np.asarray(X))


def fast_knn(X, y=None, *, n_neighbors: int = 5, **kwargs):
  """Reference ``cluster.py:218``."""
  from sklearn.neighbors import KNeighborsClassifier, NearestNeighbors
  if y is None:
    model = NearestNeighbors(n_neighbors=n_neighbors, **kwargs)
    model.fit(np.asarray(X))
  else:
    model = KNeighborsClassifier(n_neighbors=n_neighbors, **kwargs)
    model.fit(np.asarray(X), np.asarray(y).ravel())
  return model


def fast_dbscan(X, *, eps: float = 0.5, min_samples: int = 5, **kwargs):
  """Reference ``cluster.py:299``."""
  from sklearn.cluster import DBSCAN
  return DBSCAN(eps=eps, min_samples=min_samples, **kwargs).fit(np.asarray(X))


def _kmeans_transform(self, X):
  """Distance to each center (sklearn `KMeans.transform` parity)."""
  import numpy as _np
  X = _np.asarray(X, _np.float32)
  return _np.linalg.norm(X[:, None, :] - self.cluster_centers_[None], axis=-1)


KMeansJax.transform = _kmeans_transform


def dbscan_predict(db, X=None) -> np.ndarray:
  """Labels for a fitted DBSCAN (reference ``cluster.py:129`` returns the
  training labels and warns on new data; here new points are additionally
  assigned to the cluster of the nearest core sample within ``eps``, else
  noise (-1) — the standard out-of-sample DBSCAN rule)."""
  if X is None:
    return np.asarray(db.labels_)
  X = np.asarray(X)
  core = db.components_                       # (n_core, d)
  if len(core) == 0:
    return np.full(len(X), -1, dtype=np.int64)
  d2 = ((X[:, None, :] - core[None, :, :]) ** 2).sum(-1)
  nearest = np.argmin(d2, axis=1)
  within = np.sqrt(d2[np.arange(len(X)), nearest]) <= db.eps
  labels = db.labels_[db.core_sample_indices_][nearest]
  return np.where(within, labels, -1).astype(np.int64)


def fast_naive_bayes(X, y, distribution: str = "bernoulli", alpha: float = 1.0,
                     fit_prior: bool = True, class_prior=None):
  """Fitted sklearn naive-Bayes dispatcher (reference
  ``fast_lda_topics.py:12``; its distribution branches all collapsed to
  BernoulliNB — fixed here to the documented families)."""
  from sklearn.naive_bayes import BernoulliNB, CategoricalNB, MultinomialNB
  nb_cls = {"bernoulli": BernoulliNB, "categorical": CategoricalNB,
            "multinomial": MultinomialNB}
  if distribution not in nb_cls:
    raise ValueError(f"unknown NB distribution: {distribution}")
  model = nb_cls[distribution](alpha=alpha, fit_prior=fit_prior,
                               class_prior=class_prior)
  return model.fit(np.asarray(X), np.asarray(y))


__all__ += ["dbscan_predict", "fast_naive_bayes"]
