"""Discretization strategies on continuous features (reference:
``examples/discretizing_features.py``): uniform / quantile / kmeans / gmm
binning of uniform and normal samples, plus the GMM special case overlaid
on the data histogram (`plot_gaussian_mixture`).
"""
import numpy as np

CONFIG = dict(n=1024, bins=(5, 10))


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  from odin_tpu import visual as vs
  from odin_tpu.bay.vi import discretizing

  rng = np.random.RandomState(8)
  for dist, fn in [("uniform", rng.rand), ("normal", rng.randn)]:
    x = fn(cfg["n"], 1)
    vs.plot_histogram(x, bins=120, title=dist)
    for strategy in ("gmm", "uniform", "quantile", "kmeans"):
      for n_bins in cfg["bins"]:
        y = discretizing(x, n_bins=n_bins, strategy=strategy)
        assert int(y.max()) < n_bins
        vs.plot_histogram(y, bins=120, title=f"{dist}:{strategy}-{n_bins}")

  # GMM special case: show the fitted mixture over the raw histogram
  x = rng.randn(cfg["n"], 1)
  y, models = discretizing(x, n_bins=2, strategy="gmm", return_model=True)
  gmm = models[0]
  vs.plot_gaussian_mixture(x, means=gmm.means_.ravel(),
                           sigmas=gmm.covariances_.ravel(),
                           weights=gmm.weights_, title="gmm n_bins=2")
  out = vs.plot_save("/tmp/discretizing_features.pdf")
  print("figure:", out)
  return out


if __name__ == "__main__":
  main()
