"""Classical ML (reference: ``odin/ml``)."""
from typing import Optional

import numpy as np

from odin_tpu.ml.base import Evaluable, evaluate
from odin_tpu.ml.cluster import (KMeansJax, dbscan_predict, fast_dbscan,
                                 fast_kmeans, fast_knn, fast_naive_bayes)
from odin_tpu.ml.decompositions import (
    MiniBatchPCA,
    PPCA,
    RandomizedPCA,
    SupervisedPPCA,
    fast_pca,
)
from odin_tpu.ml.neural_nlp import Transformer
from odin_tpu.ml.gmm_embedding import (
    GMMThreshold,
    GMMclassifier,
    ProbabilisticEmbedding,
)
from odin_tpu.ml.gmm_tmat import GMM, Tmatrix
from odin_tpu.ml.ivector import Ivector
from odin_tpu.ml.plda import PLDA
from odin_tpu.ml.scoring import (
    Scorer,
    VectorNormalizer,
    compute_class_avg,
    compute_wccn,
    compute_within_cov,
)

__all__ = [
    "GMM", "Tmatrix", "Ivector", "PLDA", "PPCA", "SupervisedPPCA",
    "MiniBatchPCA", "fast_pca", "VectorNormalizer", "Scorer", "KMeansJax",
    "fast_kmeans", "fast_knn", "fast_dbscan", "compute_wccn",
    "compute_class_avg", "compute_within_cov", "fast_tsne", "fast_umap",
    "fast_svc", "fast_logistic_regression", "fast_gbtree_classifier",
    "fast_rf_classifier", "linear_classifier", "fast_lda_topics",
    "RandomizedPCA", "Transformer", "Evaluable", "evaluate",
]


def fast_tsne(*x, n_components: int = 2, perplexity: float = 30.0,
              random_state: int = 1, **kwargs):
  """Reference ``odin/ml`` `fast_tsne`."""
  from sklearn.manifold import TSNE
  x0 = np.asarray(x[0])
  model = TSNE(n_components=n_components,
               perplexity=min(perplexity, len(x0) - 1),
               random_state=random_state, **kwargs)
  out = model.fit_transform(x0)
  return out if len(x) == 1 else (out,) + tuple(
      model.fit_transform(np.asarray(a)) for a in x[1:])


def fast_umap(*x, n_components: int = 2, random_state: int = 1, **kwargs):
  """UMAP when installed, otherwise t-SNE fallback (the reference dispatches
  to cuml/umap-learn, ``ml/__init__.py``)."""
  try:
    import umap
    model = umap.UMAP(n_components=n_components, random_state=random_state,
                      **kwargs)
    out = model.fit_transform(np.asarray(x[0]))
    return out if len(x) == 1 else (out,) + tuple(
        model.transform(np.asarray(a)) for a in x[1:])
  except ImportError:
    return fast_tsne(*x, n_components=n_components, random_state=random_state)


def fast_svc(X, y, *, C: float = 1.0, kernel: str = "linear", **kwargs):
  """Reference ``linear_model.py:19``."""
  from sklearn.svm import SVC
  return SVC(C=C, kernel=kernel, **kwargs).fit(np.asarray(X),
                                               np.asarray(y).ravel())


def fast_logistic_regression(X, y, *, max_iter: int = 2000, **kwargs):
  """Reference ``linear_model.py:29``."""
  from sklearn.linear_model import LogisticRegression
  return LogisticRegression(max_iter=max_iter, **kwargs).fit(
      np.asarray(X), np.asarray(y).ravel())


def fast_gbtree_classifier(X, y, *, n_estimators: int = 100,
                           random_state: int = 1, **kwargs):
  """Reference ``tree.py:23``."""
  from sklearn.ensemble import GradientBoostingClassifier
  kwargs.pop("n_jobs", None)
  return GradientBoostingClassifier(n_estimators=n_estimators,
                                    random_state=random_state, **kwargs).fit(
      np.asarray(X), np.asarray(y).ravel())


def fast_rf_classifier(X, y, *, n_estimators: int = 100, random_state: int = 1,
                       **kwargs):
  """Reference ``tree.py:79``."""
  from sklearn.ensemble import RandomForestClassifier
  return RandomForestClassifier(n_estimators=n_estimators,
                                random_state=random_state, **kwargs).fit(
      np.asarray(X), np.asarray(y).ravel())


def linear_classifier(X, y, algo: str = "lda", **kwargs):
  """Dispatcher (reference ``ml/__init__.py:31-100``):
  algo in {'lda', 'svm', 'logistic', 'gbt', 'rf'}."""
  algo = str(algo).lower()
  if algo == "lda":
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
    return LinearDiscriminantAnalysis(**kwargs).fit(np.asarray(X),
                                                    np.asarray(y).ravel())
  if algo in ("svm", "svc"):
    return fast_svc(X, y, **kwargs)
  if algo in ("logistic", "logit"):
    return fast_logistic_regression(X, y, **kwargs)
  if algo in ("gbt", "gbtree"):
    return fast_gbtree_classifier(X, y, **kwargs)
  if algo in ("rf", "randomforest"):
    return fast_rf_classifier(X, y, **kwargs)
  raise ValueError(f"unknown classifier algo '{algo}'")


def fast_lda_topics(X, *, n_topics: int = 10, max_iter: int = 20,
                    random_state: int = 1, **kwargs):
  """Latent Dirichlet Allocation over a count matrix
  (reference ``odin/ml`` `fast_lda_topics`); for the amortized/VAE version
  see ``odin_tpu.bay.vi.amortizedLDA``."""
  from sklearn.decomposition import LatentDirichletAllocation
  model = LatentDirichletAllocation(n_components=n_topics, max_iter=max_iter,
                                    random_state=random_state, **kwargs)
  model.fit(np.asarray(X))
  return model


def clustering(X, algo, n_clusters: int = 8, random_state: int = 1,
               **kwargs):
  """Dispatch clustering by name (reference ``ml/__init__.py:101``)."""
  algo = str(algo).strip().lower()
  if "kmean" in algo:
    return fast_kmeans(X, n_clusters=n_clusters, random_state=random_state,
                       **kwargs)
  if "knn" in algo:
    return fast_knn(X, n_neighbors=kwargs.pop("n_neighbors", n_clusters),
                    **kwargs)
  if "dbscan" in algo:
    return fast_dbscan(X, **kwargs)
  raise ValueError(f"no clustering algorithm named '{algo}'")


def dimension_reduce(*X, algo: str = "pca", n_components: int = 2,
                     random_state: int = 1, **kwargs):
  """Dimension reduction by name over one or more arrays
  (reference ``ml/__init__.py:129``)."""
  algo = str(algo).strip().lower()
  if "pca" in algo:
    return fast_pca(*X, n_components=n_components, **kwargs)
  if "umap" in algo:
    return fast_umap(*X, n_components=n_components,
                     random_state=random_state, **kwargs)
  if "tsne" in algo:
    return fast_tsne(*X, n_components=n_components,
                     random_state=random_state, **kwargs)
  if "kmean" in algo:
    model = fast_kmeans(X[0], n_clusters=n_components,
                        random_state=random_state, **kwargs)
    out = [model.transform(np.asarray(x)) for x in X]
    return out[0] if len(X) == 1 else tuple(out)
  if "knn" in algo:
    model = fast_knn(X[0], n_neighbors=n_components, **kwargs)
    out = [model.kneighbors(np.asarray(x))[0] for x in X]
    return out[0] if len(X) == 1 else tuple(out)
  raise ValueError(f"no dimension-reduction algorithm named '{algo}'")


from enum import IntFlag as _IntFlag, auto as _auto


class DimReduce(_IntFlag):
  """Composable dimension-reduction selector
  (reference ``ml/__init__.py:209``): ``(DimReduce.PCA | DimReduce.TSNE)(X)``
  runs each selected method and returns the list of results."""

  PCA = _auto()
  UMAP = _auto()
  TSNE = _auto()
  KNN = _auto()
  KMEANS = _auto()

  def __iter__(self):
    for m in type(self):
      if m in self:
        yield m

  def __len__(self):
    return len(list(iter(self)))

  @property
  def is_single(self) -> bool:
    return len(self) == 1

  def __call__(self, *X, n_components: int = 2, random_state: int = 1,
               **kwargs):
    methods = list(iter(self))
    outs = [dimension_reduce(*X, algo=m.name.lower(),
                             n_components=n_components,
                             random_state=random_state, **kwargs)
            for m in methods]
    return outs[0] if len(outs) == 1 else outs


def get_topics_string(lda, vocabulary, n_topics: int = 10,
                      n_words: int = 10, show_word_prob: bool = False):
  """Human-readable topic summaries from any model with `components_`
  (reference ``ml/fast_lda_topics.py:29``)."""
  topics = np.asarray(lda.components_)
  alpha = topics.sum(1)
  alpha = alpha / alpha.sum()
  topics = topics / topics.sum(1, keepdims=True)
  text = []
  for idx, t in enumerate(np.argsort(-alpha, kind="mergesort")[:n_topics]):
    words = topics[t]
    desc = " ".join(
        f"{vocabulary[i]}_{words[i]:.2f}" if show_word_prob
        else f"{vocabulary[i]}" for i in np.argsort(-words)[:n_words])
    text.append(f"[#{idx}]index:{t:3d} alpha={alpha[t]:.2f} {desc}")
  return np.array(text)


__all__ += ["clustering", "dimension_reduce", "DimReduce", "evaluate",
            "get_topics_string"]
