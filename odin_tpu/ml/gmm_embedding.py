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

  # -- diagnostics (reference ``odin/ml/gmm_embedding.py:284-430``) ---------
  def _check_input(self, X, labels):
    X = np.atleast_2d(np.asarray(X, np.float64))
    n = X.shape[1]
    assert n == len(self._gmms), \
        f"fitted with {len(self._gmms)} dims but given {n}"
    if labels is None:
      labels = [f"#{i}" for i in range(n)]
    assert len(labels) == n, "labels/dimensions mismatch"
    return X, list(labels), n

  def plot_diagnosis(self, X, labels=None, n_bins: int = 120):
    """Per-dimension histogram + fitted GMM pdf + per-component bells +
    the positive region shaded (reference `plot_diagnosis`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import stats as sp_stats
    X, labels, n = self._check_input(X, labels)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.2 * n), squeeze=False)
    for i, (ax, name, gmm) in enumerate(zip(axes[:, 0], labels, self._gmms)):
      x = X[:, i]
      count, bins, _ = ax.hist(x, bins=n_bins, alpha=0.4, color="gray")
      grid = np.linspace(bins[0], bins[-1], 600)[:, None]
      pdf = np.exp(gmm.score_samples(grid))
      pdf = pdf / max(pdf.max(), 1e-12) * max(count.max(), 1)
      ax.plot(grid.ravel(), pdf, "r-", lw=1.5, alpha=0.7)
      llk = gmm.score(x[:, None])
      ax.set_title(f"[{name}] LLK:{llk:.2f} BIC:{gmm.bic(x[:, None]):.2f} "
                   f"AIC:{gmm.aic(x[:, None]):.2f}", fontsize=8)
      # per-component bells on a twin axis
      means = gmm.means_.ravel()
      stds = np.sqrt(gmm.covariances_.ravel())
      tw = ax.twinx()
      for m, s in zip(means, stds):
        tw.plot(grid.ravel(), sp_stats.norm.pdf(grid.ravel(), m, s),
                lw=1.0, alpha=0.8)
      tw.set_yticks([])
      # shade the region assigned to the positive (highest-mean) component
      top = int(np.argmax(means))
      resp = gmm.predict_proba(grid)[:, top]
      pos = resp > 0.5
      if pos.any():
        ax.fill_between(grid.ravel(), 0, max(count.max(), 1), where=pos,
                        alpha=0.15, color="green")
        ax.text(grid.ravel()[pos][0], 0, f"{grid.ravel()[pos][0]:.2f}",
                fontsize=7)
    fig.tight_layout()
    self.add_figure("diagnosis", fig)
    return self

  def plot_distribution(self, X, labels=None):
    """Column-sum distribution of raw vs binarized vs probabilized scores
    (reference `plot_distribution`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    X, labels, n = self._check_input(X, labels)
    norm01 = lambda v: v / max(np.sum(v), 1e-12)
    dist_raw = norm01(np.sum(X, axis=0))
    dist_bin = norm01(np.sum(self.binarize(X), axis=0))
    dist_prob = norm01(np.sum(self.predict_proba(X), axis=0))
    x = np.arange(n)
    fig, ax = plt.subplots(figsize=(max(1.2 * n, 4), 3))
    b1 = ax.bar(x, dist_raw, width=0.2, alpha=0.8)
    b2 = ax.bar(x + 0.2, dist_bin, width=0.2, alpha=0.8)
    b3 = ax.bar(x + 0.4, dist_prob, width=0.2, alpha=0.8)
    ax.set_xticks(x + 0.2)
    ax.set_xticklabels(labels, rotation=-10)
    ax.legend([b1, b2, b3], ["Original", "Binarized", "Probabilized"],
              fontsize=7)
    ax.grid(True, axis="y")
    ax.set_axisbelow(True)
    fig.tight_layout()
    self.add_figure("distribution", fig)
    return self

  def boxplot(self, X, labels=None):
    """Per-dimension boxplots of original / non-zero values
    (reference `boxplot`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    X, labels, n = self._check_input(X, labels)
    fig, axes = plt.subplots(n, 2, figsize=(5, 2.0 * n), squeeze=False)
    for i, name in enumerate(labels):
      x = X[:, i]
      axes[i, 0].boxplot(x, whis=1.5, showmeans=True, meanline=True,
                         flierprops={"marker": ".", "markersize": 6})
      axes[i, 0].set_ylabel(name)
      axes[i, 0].set_xticklabels(["Original"])
      nz = x[x > 0]
      axes[i, 1].boxplot(nz if nz.size else x, whis=1.5, showmeans=True,
                         meanline=True,
                         flierprops={"marker": ".", "markersize": 6})
      axes[i, 1].set_xticklabels(["NonZeros"])
    fig.tight_layout()
    self.add_figure("boxplot", fig)
    return self

  # Visualizer surface (add_figure/save_figures) without forcing the mixin
  def add_figure(self, name, fig):
    if not hasattr(self, "_figures"):
      self._figures = {}
    self._figures[name] = fig
    return self

  def save_figures(self, path: str = "figures.pdf", clear: bool = True):
    from odin_tpu.visual import plot_save
    out = plot_save(path, figs=list(getattr(self, "_figures", {}).values()),
                    clear_all=False)
    if clear:
      self._figures = {}
    return out


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
