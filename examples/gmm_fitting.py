"""EM fitting of the XLA `GMM` on an artificial 2-D mixture
(reference: ``examples/machine_learning/gmm_fitting.py``).

The reference sweeps niter x downsample x stochastic-downsample to show how
many EM iterations each needs; here the binary-mixup EM (`ml/gmm_tmat.py`)
converges from nmix=1 by doubling, so the sweep is over `niter` only, and
each fit is overlaid on the data with `plot_gaussian_mixture`.
"""
import numpy as np

CONFIG = dict(nmix=8, n_per_component=512, niters=(2, 8, 32))


def make_data(nmix, n, rng):
  means = rng.randint(-18, 18, size=(nmix, 2)).astype("float32")
  scales = (rng.rand(nmix, 2) + 0.5).astype("float32")
  x = np.concatenate(
      [m + s * rng.randn(n, 2).astype("float32")
       for m, s in zip(means, scales)])
  return x, means


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import matplotlib
  matplotlib.use("Agg")
  from odin_tpu.ml import GMM
  from odin_tpu import visual as V

  rng = np.random.RandomState(1234)
  x, true_means = make_data(cfg["nmix"], cfg["n_per_component"], rng)
  print("data:", x.shape)

  for niter in cfg["niters"]:
    gmm = GMM(nmix=cfg["nmix"], niter=niter, seed=1)
    gmm.fit(x)
    mu = np.asarray(gmm.mu).T       # (nmix, 2)
    sigma = np.asarray(gmm.sigma).T # (nmix, 2) diagonal
    w = np.ravel(np.asarray(gmm.w))
    avg_ll = float(np.mean(gmm.logprob(x)))
    ax = V.plot_gaussian_mixture(
        x, mu, sigma, w, title=f"niter={niter}  avg-llk={avg_ll:.3f}")
    ax.scatter(true_means[:, 0], true_means[:, 1], marker="x", c="red", s=60)
    print(f"niter={niter:3d}  avg-llk={avg_ll:.4f}")
  path = V.plot_save("/tmp/gmm_fitting.pdf")
  print("figure:", path or "/tmp/gmm_fitting.pdf")


if __name__ == "__main__":
  main()
