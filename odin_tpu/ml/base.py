"""Classifier evaluation report: `evaluate` + `Evaluable` mixin.

Reference: ``odin/ml/base.py`` — module-level `evaluate(y_true,
y_pred_proba, ...)` printing log-loss / accuracy / C_norm / EER / minDCF
plus an ASCII confusion matrix, and optionally saving a multipage PDF of
confusion-matrix + DET/ROC curves; `Evaluable` (:133-166) is the mixin that
routes an estimator's `predict_proba`/`predict_log_proba` through it.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["evaluate", "Evaluable"]


def _as_label_indices(y) -> np.ndarray:
  y = np.asarray(y)
  if y.ndim == 2:  # one-hot -> indices
    y = np.argmax(y, axis=-1)
  return y.astype(int)


def evaluate(y_true,
             y_pred_proba: Optional[np.ndarray] = None,
             y_pred_log_proba: Optional[np.ndarray] = None,
             labels: Optional[Sequence[str]] = None,
             title: str = "",
             path: Optional[str] = None,
             print_log: bool = True) -> dict:
  """Score a classifier's probability outputs (reference ``ml/base.py:18``).

  Returns the score dict {log_loss, accuracy, Cnorm, EER, minDCF} (the
  reference only printed them); `path` writes the multipage PDF report
  (confusion matrix, C_norm bars, per-class + micro DET/ROC curves).
  """
  import jax.numpy as jnp

  from odin_tpu.backend.maths import to_llr
  from odin_tpu.backend.metrics import (
      compute_Cnorm,
      compute_EER,
      compute_minDCF,
      det_curve,
      roc_curve,
  )
  from odin_tpu.visual import print_confusion

  if y_pred_proba is None and y_pred_log_proba is None:
    raise ValueError("At least one of `y_pred_proba` or `y_pred_log_proba` "
                     "must not be None")
  scores = y_pred_proba if y_pred_log_proba is None else y_pred_log_proba
  y_llr = np.asarray(to_llr(jnp.asarray(scores)))
  n_classes = y_llr.shape[1]
  y_true = _as_label_indices(y_true)
  y_pred = np.argmax(y_llr, axis=-1)
  if labels is None:
    labels = [str(i) for i in range(n_classes)]

  # scores
  if y_pred_proba is not None:
    p = np.clip(np.asarray(y_pred_proba, np.float64), 1e-12, 1.0)
    p = p / p.sum(-1, keepdims=True)
    ll = float(-np.mean(np.log(p[np.arange(len(y_true)), y_true])))
  else:
    ll = float("nan")
  acc = float(np.mean(y_pred == y_true))
  cm = np.zeros((n_classes, n_classes), np.int64)
  np.add.at(cm, (y_true, y_pred), 1)
  cnorm, cnorm_arr = compute_Cnorm(y_true, y_llr)
  # binary-style DET over flattened one-vs-rest targets (reference pools
  # per-class target/non-target trials through det_curve)
  onehot = np.eye(n_classes)[y_true]
  Pfa, Pmiss, _ = det_curve(onehot.ravel(), y_llr.ravel())
  eer = compute_EER(Pfa, Pmiss)
  mindcf = compute_minDCF(Pfa, Pmiss)[0]
  out = dict(log_loss=ll, accuracy=acc, Cnorm=float(np.mean(cnorm)),
             EER=float(eer), minDCF=float(mindcf), confusion_matrix=cm)

  if print_log:
    print("--------", title)
    print(f"Log loss : {ll:.4f}")
    print(f"Accuracy : {acc:.4f}")
    print(f"C_norm   : {np.mean(cnorm):.4f}")
    print(f"EER      : {eer:.4f}")
    print(f"minDCF   : {mindcf:.4f}")
    print(print_confusion(cm, labels))

  if path is not None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from odin_tpu.visual import plot_confusion_matrix, plot_save
    from odin_tpu.visual.extended import plot_Cnorm, plot_detection_curve
    figs = []
    fig = plt.figure(figsize=(max(4, n_classes), max(4, n_classes) + 1))
    plot_confusion_matrix(cm, labels)
    figs.append(fig)
    fig = plt.figure(figsize=(max(4, n_classes) + 1, 3))
    plot_Cnorm(np.atleast_2d(cnorm_arr), labels, Ptrue=(0.5,))
    figs.append(fig)
    fig = plt.figure()
    plot_detection_curve(Pfa, Pmiss, curve="det")
    plt.title(f"DET micro {title}")
    figs.append(fig)
    fpr, tpr, _ = roc_curve(onehot.ravel(), y_llr.ravel())
    fig = plt.figure()
    plot_detection_curve(fpr, tpr, curve="roc")
    plt.title(f"ROC micro {title}")
    figs.append(fig)
    plot_save(path, figs=figs)
  return out


class Evaluable:
  """Mixin: any estimator with `labels` + `predict_proba` (or
  `predict_log_proba`) gains a one-call evaluation report
  (reference ``ml/base.py:133``)."""

  @property
  def labels(self):
    raise NotImplementedError

  def evaluate(self, X, y, labels=None, title="", path=None,
               print_log: bool = True):
    if labels is None:
      try:
        labels = self.labels
      except NotImplementedError:
        labels = None
    proba = self.predict_proba(X) if hasattr(self, "predict_proba") else None
    if hasattr(self, "predict_log_proba"):
      log_proba = self.predict_log_proba(X)
    elif proba is not None:
      log_proba = np.log(np.clip(np.asarray(proba), 1e-12, 1.0))
    else:
      raise ValueError(
          f'Class "{type(self).__name__}" must have `predict_proba` or '
          "`predict_log_proba`")
    evaluate(y_true=y, y_pred_proba=proba, y_pred_log_proba=log_proba,
             labels=labels, title=title, path=path, print_log=print_log)
    return self
