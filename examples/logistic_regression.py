"""Classifier entry script (reference: ``examples/logistic_regression.py``):
fit `ml.fast_logistic_regression` on a dataset from the fuel registry,
report accuracy + confusion matrix (graphical + terminal), and persist the
score via `ScoreBoard` — the reference's fit/evaluate/report loop.
"""
import numpy as np

CONFIG = dict(ds="halfmoons", n=2048)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  from sklearn.metrics import accuracy_score, confusion_matrix

  from odin_tpu import visual as vs
  from odin_tpu.fuel import get_dataset
  from odin_tpu.ml import fast_logistic_regression
  from odin_tpu.training import ScoreBoard

  ds = get_dataset(cfg["ds"], n_samples=cfg["n"])
  Xtr, ytr = ds.numpy("train")
  Xte, yte = ds.numpy("test")
  ytr, yte = np.asarray(ytr).ravel(), np.asarray(yte).ravel()
  if ytr.dtype.kind == "f" and ytr.ndim == 1:
    ytr, yte = ytr.astype("int64"), yte.astype("int64")

  clf = fast_logistic_regression(np.asarray(Xtr), ytr)
  pred = clf.predict(np.asarray(Xte))
  acc = float(accuracy_score(yte, pred))
  cm = confusion_matrix(yte, pred)
  print(f"test accuracy: {acc:.4f}")
  vs.print_confusion(cm)
  vs.plot_confusion_matrix(cm, title=f"{cfg['ds']} acc={acc:.3f}")
  out = vs.plot_save("/tmp/logistic_regression.pdf")

  board = ScoreBoard("/tmp/logreg_scores.db")
  board.write("logreg", unique=("ds",), ds=cfg["ds"], acc=acc)
  print("figure:", out)
  return acc


if __name__ == "__main__":
  main()
