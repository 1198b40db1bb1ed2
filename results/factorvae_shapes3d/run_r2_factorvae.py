"""Round-2 FactorVAE on Shapes3D with the reference's recommended
hyperparameters (``factor_vae.py:125-141``: tc_coef=7 for Shapes3D,
discriminator Adam lr 1e-5 for color data, beta1 0.5 / beta2 0.9) — the
adversarial two-optimizer path at scale on RGB data, compared against the
recorded BetaVAE(6) run on the same procedural corpus
(results/betavae6_shapes3d_200k.json: MIG 0.153, DCI-d 0.473).

Run (on the TPU chip):  python results/factorvae_shapes3d/run_r2_factorvae.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.vi import DisentanglementGym
from odin_tpu.bay.vi.autoencoder import FactorVAE
from odin_tpu.fuel import Shapes3D
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 150_000
BATCH = 128  # split in half: VAE 64 + discriminator 64 (reference protocol)


def main():
  ds = Shapes3D(n_samples=8_192)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)

  nets = get_networks("shapes3d", zdim=10)
  vae = FactorVAE(tc_coef=7.0, discriminator_lr=1e-5,
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
  rep = gym.write_report(path=os.path.join(OUT, "factorvae_r2_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, "factorvae_r2_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, "factorvae_r2_correlation.png"))
  rep = {k: float(v) for k, v in rep.items() if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  with open(os.path.join(OUT, "factorvae_shapes3d_r2_150k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  vae.save_weights(os.path.join(OUT, "factorvae_shapes3d_r2_150k.pkl"))
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
