"""Rate-distortion of categorical information through a Gaussian bottleneck
(reference: ``examples/vae/rate_distortion_onehot.py`` — a beta x gamma grid
of BetaGammaVAEs autoencoding one-hot MNIST digits, scoring accuracy / llk /
kl / active units per grid point).

Here the categorical source is the dataset's discrete factor (dSprites
shape), one-hot encoded; the model is a dense BetaGammaVAE with a onehot
observation head.  Sweep the grid with the experimenter::

  python examples/vae/rate_distortion_onehot.py beta=0.1,1,10 gamma=0.1,1,10 -j 1
"""
import numpy as np

from odin_tpu.bay import RVconf
from odin_tpu.bay.vi import BetaGammaVAE
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import Dense, SequentialNetwork
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", beta=1.0, gamma=1.0, zdim=10,
              max_iter=3000, batch_size=128, lr=1e-3, factor=0)


def onehot_factor(ds, partition, factor_index):
  _, y = ds.numpy(partition)
  labels = np.asarray(y)[:, factor_index].astype(int)
  n_classes = int(labels.max()) + 1
  return np.eye(n_classes, dtype="float32")[labels], n_classes


@run_hydra(output_dir="./results/rate_distortion_onehot", config=CONFIG)
def main(cfg):
  import jax

  ds = get_dataset(cfg.ds)
  y_train, n_classes = onehot_factor(ds, "train", cfg.factor)
  y_test, _ = onehot_factor(ds, "test", cfg.factor)
  y_test = y_test[:2048]

  vae = BetaGammaVAE(
      beta=cfg.beta, gamma=cfg.gamma,
      encoder=SequentialNetwork((Dense(256, "relu"), Dense(256, "relu")),
                                name="encoder"),
      decoder=SequentialNetwork((Dense(256, "relu"), Dense(256, "relu")),
                                name="decoder"),
      latents=RVconf((cfg.zdim,), "mvndiag", projection=True,
                     name="latents"),
      observation=RVconf((n_classes,), "onehot", projection=True,
                         name="digits"),
      input_shape=(n_classes,), hierarchy=()).build(seed=1)
  vae.fit_device_dataset(y_train, n_steps=int(cfg.max_iter),
                         batch_size=cfg.batch_size, learning_rate=cfg.lr,
                         steps_per_call=min(500, int(cfg.max_iter)),
                         verbose=False)

  llk, kl, _ = vae.elbo_components(vae.state.params, y_test,
                                   jax.random.PRNGKey(0), 0, False, {})
  qz, px = vae.reconstruct(y_test, seed=0)
  acc = float(np.mean(np.argmax(np.asarray(px.mean()), -1) ==
                      np.argmax(y_test, -1)))
  z = np.asarray(qz.mean())
  au = int(np.sum(np.var(z, 0) > 1e-2))
  row = dict(beta=float(cfg.beta), gamma=float(cfg.gamma),
             zdim=int(cfg.zdim), acc=acc,
             llk=float(np.mean(sum(np.asarray(v) for v in llk.values()))),
             kl=float(np.mean(sum(np.asarray(v) for v in kl.values()))),
             active_units=au)
  ScoreBoard("./results/scoreboard.db").write(
      "rate_distortion_onehot", unique=["beta", "gamma", "zdim"], **row)
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in row.items()})
  return row


if __name__ == "__main__":
  main()
