"""Latent spaces of iris (reference: ``examples/iris_latent_space.py``):
train a 2-D-latent VAE on the iris measurements and compare its latent
scatter against PCA — both colored by species.  Uses sklearn's bundled
iris (no download) and the dense halfmoons-style architecture.
"""
import numpy as np

CONFIG = dict(zdim=2, steps=3000, batch_size=64, lr=1e-3)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  from sklearn.datasets import load_iris

  from odin_tpu import visual as vs
  from odin_tpu.bay import RVconf
  from odin_tpu.bay.vi import VariationalAutoencoder
  from odin_tpu.ml import fast_pca
  from odin_tpu.networks import Dense, SequentialNetwork

  iris = load_iris()
  X = ((iris.data - iris.data.mean(0)) / iris.data.std(0)).astype("float32")
  y = iris.target

  vae = VariationalAutoencoder(
      encoder=SequentialNetwork((Dense(32, "relu"), Dense(32, "relu")),
                                name="encoder"),
      decoder=SequentialNetwork((Dense(32, "relu"), Dense(32, "relu")),
                                name="decoder"),
      latents=RVconf((cfg["zdim"],), "mvndiag", projection=True,
                     name="latents"),
      observation=RVconf((X.shape[1],), "normal", projection=True,
                         name="measurements"),
      input_shape=(X.shape[1],),
  ).build(seed=0)
  vae.fit_device_dataset(X, n_steps=cfg["steps"],
                         batch_size=cfg["batch_size"],
                         learning_rate=cfg["lr"],
                         steps_per_call=max(1, cfg["steps"] // 4),
                         seed=0, verbose=True)

  z = np.asarray(vae.encode(X).mean())
  z_pca = fast_pca(X, n_components=2)
  vs.plot_scatter(z[:, 0], z[:, 1], color=y, title="VAE latents (iris)")
  vs.plot_scatter(z_pca[:, 0], z_pca[:, 1], color=y, title="PCA (iris)")
  out = vs.plot_save("/tmp/iris_latent_space.pdf")
  print("figure:", out)
  return out


if __name__ == "__main__":
  main()
