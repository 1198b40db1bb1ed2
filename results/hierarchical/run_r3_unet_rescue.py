"""Round-3 UnetVAE rescue run (VERDICT r2 next-step #4).

The round-2 run (``run_r2_unet.py`` -> unet_dsprites_r2_50k.json) reproduced
the reference's documented failure mode (``odin/bay/vi/autoencoder/
hierarchical_vae.py:905``): with deterministic skips and the reference's
beta=10 / free_bits=2 configuration the skips leak everything, the model
memorizes through them (llk -> 0) and the ELBO pins at the -200 KL floor.

Measured escalation (both runs recorded in this directory):

1. Per-unit knobs FAIL (unet_dsprites_r3_perunit_50k.json):
   ``skip_dropout=0.5 + skip_noise=0.1`` still collapse — llk -9e-6,
   n_active_units 0.  dSprites is sparse/binary enough that half-dropped
   rescaled skips still carry the whole image.
2. Structured rescue (this config): ``skip_sample_dropout=0.5`` gates the
   ENTIRE skip path per sample (one Bernoulli shared by all rungs, no
   rescale) — half the batch trains in pure generation mode, so the
   decoder must model x from z alone; plus ``skip_noise=0.1`` and KL
   warm-up a la VeryDeepVAE (beta 0.01 -> 1 over 10k steps; final beta 1
   keeps the evaluated objective on the scale of the HierarchicalVAE
   baseline, hvae_dsprites_r2_100k.json: ELBO -80.0), ``free_bits=0.5``.

Success band (stated up front): ELBO in [-130, -55] (same order as the
ladder's -80), llk meaningfully negative (<-3), active units > 3.

Run (on the TPU chip):  python results/hierarchical/run_r3_unet_rescue.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.backend.interpolation import linear
from odin_tpu.bay.vi import DisentanglementGym
from odin_tpu.bay.vi.autoencoder import UnetVAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 50_000
BATCH = 64


def main():
  ds = dSprites(n_samples=65_536)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)

  nets = get_networks("dsprites", zdim=10, is_hierarchical=True)
  vae = UnetVAE(beta=linear(vmin=0.01, vmax=1.0, steps=10_000, delay_in=0),
                free_bits=0.5,
                skip_sample_dropout=0.5,
                skip_noise=0.1,
                **nets).build(seed=1)
  sched = optax.exponential_decay(3e-4, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                         learning_rate=sched, steps_per_call=1000,
                         global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"trained {STEPS} steps in {dt:.0f}s ({rate:.0f} steps/s)",
        flush=True)

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, "unet_r3_rescue_report.txt"))
  gym.plot_latents_traverse(
      path=os.path.join(OUT, "unet_r3_rescue_traverse.png"))
  gym.plot_correlation(
      path=os.path.join(OUT, "unet_r3_rescue_correlation.png"))
  gym.plot_histogram(path=os.path.join(OUT, "unet_r3_rescue_histogram.png"))
  rep = {k: (float(v) if np.isscalar(v) else v) for k, v in rep.items()
         if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  rep["config"] = ("beta linear 0.01->1 @10k, free_bits=0.5, "
                   "skip_sample_dropout=0.5, skip_noise=0.1")
  with open(os.path.join(OUT, "unet_dsprites_r3_rescue_50k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  vae.save_weights(os.path.join(OUT, "unet_dsprites_r3_rescue_50k.pkl"))
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
