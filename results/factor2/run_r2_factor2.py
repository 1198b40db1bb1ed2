"""Round-2 Factor2VAE on dSprites: the two-latent-space FactorVAE variant
(reference ``factor_vae.py:362``) with the reference's dSprites recipe
(tc_coef=35, discriminator Adam lr 1e-4, beta1 .5 / beta2 .9,
``factor_vae.py:125-141,173-175``) — content latents Z plus factors latents
C where only C is adversarially factorised.  Compared against the recorded
plain FactorVAE tc=35 run (results/factorvae_dsprites_report.json) under
the same corpus/protocol.

Run (on the TPU chip):  python results/factor2/run_r2_factor2.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi import DisentanglementGym
from odin_tpu.bay.vi.autoencoder import Factor2VAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 150_000
BATCH = 128  # split in half: VAE 64 + discriminator 64 (reference protocol)


def main():
  ds = dSprites(n_samples=65_536)
  x_train = ds.numpy("train", inc_labels=False)
  x_train = (x_train > 0.5).astype("float32")
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)

  nets = get_networks("dsprites", zdim=10)
  nets.pop("latents", None)
  vae = Factor2VAE(
      latents=RVconf(5, "mvndiag", projection=True, name="latents"),
      factors=RVconf(5, "mvndiag", projection=True, name="factors"),
      tc_coef=35.0, discriminator_lr=1e-4,
      discriminator_units=(1000,) * 5, **nets).build(seed=1)
  sched = optax.exponential_decay(1e-3, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                         learning_rate=sched, steps_per_call=500,
                         global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"trained {STEPS} steps in {dt:.0f}s ({rate:.0f} steps/s)",
        flush=True)

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, "factor2_r2_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, "factor2_r2_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, "factor2_r2_correlation.png"))
  gym.plot_latents_stats(path=os.path.join(OUT, "factor2_r2_latent_stats.png"))
  rep = {k: float(v) for k, v in rep.items() if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  with open(os.path.join(OUT, "factor2_dsprites_r2_150k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  vae.save_weights(os.path.join(OUT, "factor2_dsprites_r2_150k.pkl"))
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
