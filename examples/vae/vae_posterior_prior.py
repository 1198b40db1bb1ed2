"""Posterior/prior combinations (reference:
``examples/vae/vae_posterior_prior.py``): sweep latent posterior families
(mvndiag / normal / hyperspherical vMF) and priors (standard normal /
VampPrior mixture) on one dataset, compare ELBO + active units.

Run::

  python examples/vae/vae_posterior_prior.py max_iter=3000
"""
import numpy as np

from odin_tpu.bay.vi import get_vae
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import run_hydra
from odin_tpu.training.scores import ScoreBoard

CONFIG = dict(ds="dspritessmall", zdim=10, batch_size=32, max_iter=3000,
              lr=1e-3)

SWEEP = [
    ("vae", "mvndiag", {}),
    ("vae", "normal", {}),
    ("hypersphericalvae", "vonmisesfisher", {}),
    ("vampriorvae", "mvndiag", {"n_components": 8}),
]


@run_hydra(output_dir="./results/posterior_prior", config=CONFIG)
def main(cfg):
  from odin_tpu.bay.random_variable import RVconf

  ds = get_dataset(cfg.ds)
  board = ScoreBoard(f"{cfg.output_dir}/scores.db")
  rows = []
  for vae_name, posterior, kw in SWEEP:
    nets = get_networks("dsprites", zdim=cfg.zdim)
    if vae_name == "vae":  # swap the latent family on the vanilla VAE
      nets["latents"] = RVconf(cfg.zdim, posterior, projection=True,
                               name="latents")
    cls = get_vae(vae_name)
    init_kw = {k: v for k, v in kw.items()
               if k in cls.__init__.__code__.co_varnames}
    vae = cls(**init_kw, **nets).build()
    train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
    tr = vae.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
                 logdir=f"{cfg.output_dir}/{vae_name}_{posterior}")
    last = {k: float(v) for k, v in tr.history[-1].items()
            if isinstance(v, (int, float))}
    # active units: latent dims whose posterior mean varies across data
    x = ds.numpy("test")[0][:512]
    z = np.asarray(vae.encode(x).mean())
    active = int(np.sum(np.var(z, axis=0) > 1e-2))
    row = dict(model=vae_name, posterior=posterior, active_units=active,
               **{k: v for k, v in last.items()
                  if k in ("loss", "llk_observation", "llk_image")})
    board.write("posterior_prior", unique=("model", "posterior"), **row)
    rows.append(row)
    print(row)
  return rows


if __name__ == "__main__":
  main()
