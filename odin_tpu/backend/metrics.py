"""Verification / evaluation metrics (reference: ``odin/backend/metrics.py``).

Speaker/language-verification scoring: EER, minDCF, NIST Cavg/Cnorm, ROC/DET
curves, plus Frechet distance, accuracies, confusion matrix and Levenshtein
label-error-rate.  These run on host (NumPy) — they consume score vectors, not
device tensors.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import warnings

import numpy as np

__all__ = [
    "det_curve", "roc_curve_", "roc_curve", "prc_curve", "compute_EER", "compute_minDCF",
    "compute_AUC", "compute_Cnorm", "compute_Cavg", "frechet_distance",
    "frechet_inception_distance", "binary_accuracy", "categorical_accuracy",
    "confusion_matrix", "LER",
]


def det_curve(y_true: np.ndarray, y_score: np.ndarray,
              pos_label=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
  """False-alarm / miss rates over all thresholds (reference `det_curve`,
  ``odin/backend/metrics.py:567``).

  Returns (Pfa, Pmiss, thresholds) with rates in [0, 1].
  """
  y_true = np.asarray(y_true).ravel()
  y_score = np.asarray(y_score).ravel()
  if pos_label is None:
    pos_label = y_true.max()
  pos = y_true == pos_label
  order = np.argsort(y_score, kind="mergesort")[::-1]
  y_score = y_score[order]
  pos = pos[order]
  # thresholds at distinct score values
  distinct = np.where(np.diff(y_score))[0]
  idx = np.r_[distinct, y_true.size - 1]
  tps = np.cumsum(pos)[idx].astype(np.float64)
  fps = (1 + idx - tps).astype(np.float64)
  n_pos = max(pos.sum(), 1)
  n_neg = max((~pos).sum(), 1)
  Pmiss = 1.0 - tps / n_pos  # miss: target scored below threshold
  Pfa = fps / n_neg          # false alarm: non-target above threshold
  return Pfa, Pmiss, y_score[idx]


def compute_EER(Pfa: np.ndarray, Pmiss: np.ndarray) -> float:
  """Equal error rate from DET-curve rates (reference
  ``odin/backend/metrics.py:377``): the point where Pfa == Pmiss."""
  Pfa = np.asarray(Pfa, np.float64)
  Pmiss = np.asarray(Pmiss, np.float64)
  diff = Pmiss - Pfa
  i = np.argmin(np.abs(diff))
  if diff[i] == 0 or i in (0, len(diff) - 1):
    return float((Pfa[i] + Pmiss[i]) / 2)
  # linear interpolation around the sign change
  j = i + 1 if (diff[i] < 0) == (diff[min(i + 1, len(diff) - 1)] < 0) else i - 1
  i, j = min(i, j), max(i, j)
  if diff[i] * diff[j] > 0:
    return float((Pfa[i] + Pmiss[i]) / 2)
  t = diff[i] / (diff[i] - diff[j])
  eer = Pfa[i] + t * (Pfa[j] - Pfa[i])
  return float(eer)


def compute_minDCF(Pfa: np.ndarray, Pmiss: np.ndarray,
                   Cmiss: float = 1.0, Cfa: float = 1.0,
                   Ptrue: float = 0.5) -> Tuple[float, int]:
  """Minimum detection cost (reference ``odin/backend/metrics.py:338``)."""
  Pfa = np.asarray(Pfa, np.float64)
  Pmiss = np.asarray(Pmiss, np.float64)
  dcf = Cmiss * Pmiss * Ptrue + Cfa * Pfa * (1.0 - Ptrue)
  i = int(np.argmin(dcf))
  return float(dcf[i]), i


def compute_AUC(x: np.ndarray, y: np.ndarray, reorder: bool = False) -> float:
  """Area under a curve via trapezoid rule (reference ``metrics.py:394``)."""
  x = np.asarray(x, np.float64).ravel()
  y = np.asarray(y, np.float64).ravel()
  if reorder:
    order = np.argsort(x)
    x, y = x[order], y[order]
  return float(abs(np.trapezoid(y, x)))


def roc_curve_(y_true, y_score, pos_label=None):
  """ROC curve (fpr, tpr, thresholds); thin wrapper for API parity."""
  from sklearn.metrics import roc_curve as _roc
  return _roc(y_true, y_score, pos_label=pos_label)


roc_curve = roc_curve_  # reference name (``backend/metrics.py:431``)


def prc_curve(y_true, y_probas, pos_label=None):
  """Precision-recall curve (reference ``metrics.py:504``)."""
  from sklearn.metrics import precision_recall_curve as _prc
  return _prc(y_true, y_probas, pos_label=pos_label)


def compute_Cnorm(y_true: np.ndarray,
                  y_score: np.ndarray,
                  Ptrue: float = 0.5,
                  Cfa: float = 1.0,
                  Cmiss: float = 1.0) -> Tuple[float, np.ndarray]:
  """NIST LRE normalized detection cost over language log-likelihood matrices
  (reference ``odin/backend/metrics.py:236``).

  Args:
    y_true: (n,) integer class labels in [0, L).
    y_score: (n, L) log-likelihood (or llr) matrix.

  Returns:
    (Cavg, per-class cost vector) using the hard min-cost decision rule.
  """
  y_true = np.asarray(y_true).ravel()
  y_score = np.asarray(y_score, np.float64)
  L = y_score.shape[1]
  thr = np.log(Ptrue / (1 - Ptrue))
  costs = np.zeros(L)
  for l in range(L):
    tgt = y_true == l
    non = ~tgt
    Pmiss = np.mean(y_score[tgt, l] < thr) if tgt.any() else 0.0
    Pfa = np.mean(y_score[non, l] >= thr) if non.any() else 0.0
    costs[l] = Cmiss * Ptrue * Pmiss + Cfa * (1 - Ptrue) * Pfa
  return float(costs.mean()), costs


def compute_Cavg(y_llr: np.ndarray, y_true: np.ndarray,
                 cluster_idx: Optional[Sequence[Sequence[int]]] = None,
                 Ptar: float = 0.5, Cfa: float = 1.0, Cmiss: float = 1.0,
                 probability_based: bool = False) -> Tuple[float, np.ndarray]:
  """Pairwise language-pair average cost (reference ``metrics.py:171``).

  For each cluster of language ids, computes miss rate per target language and
  false-alarm rates between all in-cluster pairs with the LLR threshold
  ``log(Ptar/(1-Ptar))``; returns (min cluster Cavg, per-cluster vector).
  """
  y_llr = np.asarray(y_llr, np.float64)
  y_true = np.asarray(y_true).ravel()
  L = y_llr.shape[1]
  if cluster_idx is None:
    cluster_idx = [list(range(L))]
  thr = np.log(Ptar / (1 - Ptar))
  cluster_cost = np.zeros(len(cluster_idx))
  for c, cluster in enumerate(cluster_idx):
    lang_cost = []
    for lang in cluster:
      tgt = y_true == lang
      if not tgt.any():
        continue
      Pmiss = np.mean(y_llr[tgt, lang] < thr)
      Pfa_sum = 0.0
      n_pairs = 0
      for other in cluster:
        if other == lang:
          continue
        imp = y_true == other
        if imp.any():
          Pfa_sum += np.mean(y_llr[imp, lang] >= thr)
          n_pairs += 1
      Pfa = Pfa_sum / max(n_pairs, 1)
      lang_cost.append(Cmiss * Ptar * Pmiss + Cfa * (1 - Ptar) * Pfa)
    cluster_cost[c] = np.mean(lang_cost) if lang_cost else 0.0
  return float(cluster_cost.min()), cluster_cost


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
  """Frechet distance between two Gaussians (mean, covariance)."""
  from scipy import linalg
  mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
  sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
  diff = mu1 - mu2
  with warnings.catch_warnings():
    warnings.simplefilter("ignore")  # sqrtm warns on ill-conditioned input
    covmean = linalg.sqrtm(sigma1 @ sigma2)
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
  if np.iscomplexobj(covmean):
    covmean = covmean.real
  return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def frechet_inception_distance(features1: np.ndarray, features2: np.ndarray) -> float:
  """FID over two sets of (pre-extracted) feature activations
  (reference ``odin/backend/metrics.py:18``).  The inception network itself is
  supplied by the caller (``DisentanglementGym`` uses the decoder features when
  no inception weights are available offline)."""
  f1 = np.asarray(features1, np.float64).reshape(len(features1), -1)
  f2 = np.asarray(features2, np.float64).reshape(len(features2), -1)
  mu1, mu2 = f1.mean(0), f2.mean(0)
  s1 = np.cov(f1, rowvar=False)
  s2 = np.cov(f2, rowvar=False)
  return frechet_distance(mu1, s1, mu2, s2)


def binary_accuracy(y_true, y_pred, threshold: float = 0.5) -> float:
  y_true = np.asarray(y_true).ravel()
  y_pred = (np.asarray(y_pred).ravel() >= threshold).astype(y_true.dtype)
  return float(np.mean(y_true == y_pred))


def categorical_accuracy(y_true, y_pred) -> float:
  y_true = np.asarray(y_true)
  y_pred = np.asarray(y_pred)
  if y_true.ndim > 1:
    y_true = y_true.argmax(-1)
  if y_pred.ndim > 1:
    y_pred = y_pred.argmax(-1)
  return float(np.mean(y_true == y_pred))


def confusion_matrix(y_true, y_pred, labels=None, normalize: bool = False) -> np.ndarray:
  from sklearn.metrics import confusion_matrix as _cm
  cm = _cm(y_true, y_pred, labels=labels).astype(np.float64)
  if normalize:
    cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-12)
  return cm


def _levenshtein(s1: Sequence, s2: Sequence) -> int:
  if len(s1) < len(s2):
    s1, s2 = s2, s1
  prev = list(range(len(s2) + 1))
  for i, c1 in enumerate(s1):
    curr = [i + 1]
    for j, c2 in enumerate(s2):
      curr.append(min(prev[j + 1] + 1, curr[j] + 1, prev[j] + (c1 != c2)))
    prev = curr
  return prev[-1]


def LER(y_true, y_pred, return_mean: bool = True):
  """Label error rate = Levenshtein distance / target length
  (reference ``odin/backend/metrics.py:693``)."""
  rates = [
      _levenshtein(t, p) / max(len(t), 1) for t, p in zip(y_true, y_pred)
  ]
  return float(np.mean(rates)) if return_mean else rates
