"""Round-3 ladder-family completion: PUnetVAE + VeryDeepVAE at 50k steps.

Completes the recorded hierarchical family on dSprites under the protocol
every other entry in this directory uses (procedural dSprites 65,536-image
corpus, batch 64, lr 3e-4 exponential decay 0.996/10k, clipnorm 100,
10k-sample posterior-path Gym eval):

- HierarchicalVAE 100k  -> hvae_dsprites_r2_100k.json   (ELBO -80.0)
- UnetVAE collapse 50k  -> unet_dsprites_r2_50k.json    (llk -3e-4, leak)
- UnetVAE rescue 50k    -> unet_dsprites_r3_rescue_50k.json (ELBO -25.1)
- PUnetVAE 50k          -> THIS script (reference defaults beta=10,
  free_bits=2 — the probabilistic skips are ladder rungs CHARGED with KL,
  so unlike the U-Net's free deterministic skips, leak is penalized;
  reference ``odin/bay/vi/autoencoder/hierarchical_vae.py:986``)
- VeryDeepVAE 50k       -> THIS script (ladder + Sønderby KL warm-up
  1e-6 -> 1 over 2k steps, free_bits 0.25; reference ``:1098``)

Success bands (stated up front): VeryDeepVAE — ELBO within the ladder band
[-130, -55], llk < -3 (a real generative model), active units > 3.
PUnetVAE — llk meaningfully negative (< -3, i.e. NOT the U-Net's
memorize-through-skips llk -> 0), per-rung KLs finite.

Run (on the TPU chip):  python results/hierarchical/run_r3_ladder_family.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.vi import DisentanglementGym
from odin_tpu.bay.vi.autoencoder import PUnetVAE, VeryDeepVAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 50_000
BATCH = 64


def gym_report(vae, ds, tag):
  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{tag}_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, f"{tag}_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, f"{tag}_correlation.png"))
  gym.plot_histogram(path=os.path.join(OUT, f"{tag}_histogram.png"))
  return rep


def train_and_record(vae, x_train, ds, tag, config_note):
  sched = optax.exponential_decay(3e-4, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                         learning_rate=sched, steps_per_call=1000,
                         global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"{tag}: {STEPS} steps in {dt:.0f}s = {rate:.0f} steps/s", flush=True)
  vae.save_weights(os.path.join(OUT, f"{tag}_50k.pkl"))
  rep = gym_report(vae, ds, tag)
  rep = {k: (float(v) if np.isscalar(v) else v) for k, v in rep.items()
         if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  rep["config"] = config_note
  with open(os.path.join(OUT, f"{tag}_50k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print(tag.upper(), json.dumps(rep), flush=True)
  return rep


def main():
  ds = dSprites(n_samples=65_536)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)
  nets_kw = dict(zdim=10, is_hierarchical=True)

  vdvae = VeryDeepVAE(**get_networks("dsprites", **nets_kw)).build(seed=1)
  rep_v = train_and_record(
      vdvae, x_train, ds, "vdvae_dsprites_r3",
      "defaults: free_bits=0.25, KL warm-up 1e-6->1 over 2k steps")

  punet = PUnetVAE(**get_networks("dsprites", **nets_kw)).build(seed=1)
  rep_p = train_and_record(
      punet, x_train, ds, "punet_dsprites_r3",
      "reference defaults: beta=10, free_bits=2, ladder_units=16")

  print(f"BAND CHECK: vdvae elbo {rep_v['elbo']:.1f} (ladder band "
        f"[-130,-55]), llk {rep_v['log_likelihood']:.2f}; "
        f"punet llk {rep_p['log_likelihood']:.2f} (must be < -3)",
        flush=True)


if __name__ == "__main__":
  main()
