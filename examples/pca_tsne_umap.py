"""Compare PCA / t-SNE / UMAP embeddings of the sklearn digits corpus
(reference: ``examples/machine_learning/pca_tsne_umap.py``).

`fast_pca` is the XLA-backed PCA in `ml/decompositions.py`; `fast_tsne` /
`fast_umap` fall back to sklearn TSNE when the optional umap package is
absent (no-egress environment), matching the reference's fast_* wrappers.
"""
import numpy as np

CONFIG = dict(test_size=0.3, seed=8)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import matplotlib
  matplotlib.use("Agg")
  from sklearn.datasets import load_digits
  from sklearn.model_selection import train_test_split
  from odin_tpu import ml
  from odin_tpu import visual as V

  np.random.seed(cfg["seed"])
  X, y = load_digits(return_X_y=True)
  X_train, X_test, y_train, y_test = train_test_split(
      X, y, test_size=cfg["test_size"], random_state=cfg["seed"])

  embeddings = {"pca": ml.fast_pca(X_train, X_test, n_components=2)}
  try:
    embeddings["tsne"] = ml.fast_tsne(X_train, X_test, n_components=2)
  except Exception as e:  # heavy optional path
    print("tsne skipped:", e)
  try:
    embeddings["umap"] = ml.fast_umap(X_train, X_test, n_components=2)
  except Exception as e:
    print("umap skipped:", e)

  for name, (e_train, e_test) in embeddings.items():
    fig = V._plt().figure(figsize=(10, 5))
    for i, (e, lab, tag) in enumerate(
        [(e_train, y_train, "train"), (e_test, y_test, "test")]):
      ax = fig.add_subplot(1, 2, i + 1)
      sc = ax.scatter(e[:, 0], e[:, 1], c=lab, s=10, alpha=0.6, cmap="tab10")
      ax.set_title(f"{name} ({tag})")
    V._FIGURES.append(fig)
    print(name, e_train.shape, e_test.shape)
  path = V.plot_save("/tmp/pca_tsne_umap.pdf")
  print("figure:", path or "/tmp/pca_tsne_umap.pdf")


if __name__ == "__main__":
  main()
