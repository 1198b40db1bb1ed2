"""Rate-distortion sweep (reference: ``examples/vae/rate_distortion.py``):
train beta-VAEs across beta values and plot the rate (KL) vs distortion
(-llk) frontier.

Run: ``python examples/vae/rate_distortion.py beta=0.25,1,4,16 max_iter=1500``
"""
import numpy as np

from odin_tpu.bay.vi import BetaVAE
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import ScoreBoard, run_hydra

CONFIG = dict(ds="dspritessmall", beta=1.0, zdim=10, batch_size=64,
              max_iter=1500, lr=1e-3)


@run_hydra(output_dir="./results/rate_distortion", config=CONFIG)
def main(cfg):
  import jax
  ds = get_dataset(cfg.ds)
  vae = BetaVAE(beta=cfg.beta,
                **get_networks("dsprites", zdim=cfg.zdim)).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  vae.fit(train, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          logdir=cfg.output_dir, verbose=False)
  x_test, _ = ds.numpy("test")
  x_test = ds.normalize255(x_test)[:512]
  ev = vae.make_eval_fn(jit=False)
  m = {k: float(v) for k, v in
       jax.device_get(ev(vae.state, x_test)).items()}
  rate = m["kl_latents"]
  distortion = -m["llk_image"]
  print(f"beta={cfg.beta}: rate={rate:.2f} nats, distortion={distortion:.2f}")
  ScoreBoard("./results/scoreboard.db").write(
      "rate_distortion", unique=["beta"], beta=cfg.beta, rate=rate,
      distortion=distortion)
  return dict(beta=cfg.beta, rate=rate, distortion=distortion)


if __name__ == "__main__":
  main()
