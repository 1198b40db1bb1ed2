"""Discrete-latent VAE (VQ-VAE) experiment (reference:
``examples/vae/vae_discrete_test.py``): train a VQ-VAE with an optional
EMA codebook, then inspect reconstructions, codebook usage, and samples
decoded from random code assignments.

Run::

  python examples/vae/vae_discrete_test.py ema=true niter=10000
"""
import os

import numpy as np

from odin_tpu.bay.vi import VQVAE
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", n_codes=64, code_dim=16, commitment=0.25,
              ema=False, niter=5000, batch_size=128, lr=1e-3)


@run_hydra(output_dir="./results/vae_discrete", config=CONFIG)
def main(cfg):
  import jax

  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.code_dim)
  vae = VQVAE(n_codes=cfg.n_codes, code_dim=cfg.code_dim,
              commitment_weight=cfg.commitment, ema=bool(cfg.ema),
              encoder=nets["encoder"], decoder=nets["decoder"],
              observation=nets["observation"],
              input_shape=nets["input_shape"]).build(seed=1)
  x, _ = ds.numpy("train")
  x = ds.normalize255(x)
  vae.fit_device_dataset(x, n_steps=int(cfg.niter),
                         batch_size=cfg.batch_size, learning_rate=cfg.lr,
                         steps_per_call=min(500, int(cfg.niter)),
                         verbose=False)

  # --- evaluation: reconstruction llk + codebook usage --------------------
  x_test, _ = ds.numpy("test")
  x_test = ds.normalize255(x_test)[:512]
  llk, kl, _ = vae.elbo_components(vae.state.params, x_test,
                                   jax.random.PRNGKey(0), 0, False,
                                   vae.state.mutables)
  llk_m = float(np.mean(sum(np.asarray(v) for v in llk.values())))
  codes = np.asarray(vae.encode_codes(x_test))
  usage = len(np.unique(codes)) / float(cfg.n_codes)

  # --- plots: reconstructions + prior-ish samples (random codes) ----------
  from odin_tpu import visual as vs
  qz, px = vae.reconstruct(x_test[:16], seed=1)
  fig_r = vs.plot_images(np.asarray(px.mean()), title="reconstruction")
  rng = np.random.RandomState(1)
  rand_codes = rng.randint(0, cfg.n_codes, size=codes[:16].shape)
  px_s = vae.decode_codes(rand_codes)
  fig_s = vs.plot_images(np.asarray(px_s.mean()), title="random codes")
  vs.plot_save(os.path.join(cfg.output_dir, "vqvae.pdf"),
               figs=[fig_r, fig_s], verbose=False)

  row = dict(ema=int(bool(cfg.ema)), n_codes=int(cfg.n_codes),
             llk=llk_m, codebook_usage=usage)
  ScoreBoard("./results/scoreboard.db").write(
      "vae_discrete", unique=["ema", "n_codes"], **row)
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in row.items()})
  return row


if __name__ == "__main__":
  main()
