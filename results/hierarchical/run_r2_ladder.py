"""Round-2 hierarchical run: BiConv ladder VAE on procedural dSprites with
the FIXED posterior-path Gym (10k-sample protocol), plus the recorded flat
BetaVAE checkpoint re-evaluated under the identical protocol.

Round-1 recorded gym elbo -3251 for the ladder because evaluation decoded in
generation mode (rung posteriors discarded); training llk was -7.4.  This
run is the VERDICT r1 #3 'done' evidence: ladder ELBO within a sane band of
the flat model on the same data + a TPU run entry.

Run (on the TPU chip):  python results/hierarchical/run_r2_ladder.py
"""
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import optax

from odin_tpu.bay.vi import BetaVAE, DisentanglementGym, HierarchicalVAE
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 100_000
BATCH = 64


def gym_report(vae, ds, tag):
  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{tag}_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, f"{tag}_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, f"{tag}_correlation.png"))
  gym.plot_histogram(path=os.path.join(OUT, f"{tag}_histogram.png"))
  return rep


def main():
  ds = dSprites(n_samples=65_536)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)

  # --- ladder VAE, r1 stable recipe: lr 3e-4 exp decay + clipnorm ---------
  nets = get_networks("dsprites", zdim=10, is_hierarchical=True)
  vae = HierarchicalVAE(**nets).build(seed=1)
  sched = optax.exponential_decay(3e-4, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                         learning_rate=sched, steps_per_call=1000,
                         global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"ladder: {STEPS} steps in {dt:.0f}s = {rate:.0f} steps/s", flush=True)
  vae.save_weights(os.path.join(OUT, "hvae_dsprites_r2_100k.pkl"))
  rep = gym_report(vae, ds, "hvae_r2")
  rep["steps_per_sec"] = rate
  with open(os.path.join(OUT, "hvae_dsprites_r2_100k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print("LADDER", {k: round(v, 4) if isinstance(v, float) else v
                   for k, v in rep.items()}, flush=True)

  # --- flat BetaVAE checkpoint under the SAME 10k posterior-path protocol -
  flat = BetaVAE(beta=4.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  flat.load_weights(os.path.join(OUT, "..", "betavae_dsprites_150k.pkl"))
  rep_flat = gym_report(flat, ds, "betavae4_r2proto")
  with open(os.path.join(OUT, "betavae4_10k_protocol.json"), "w") as f:
    json.dump(rep_flat, f, indent=1)
  print("FLAT", {k: round(v, 4) if isinstance(v, float) else v
                 for k, v in rep_flat.items()}, flush=True)
  print(f"BAND CHECK: ladder elbo {rep['elbo']:.1f} vs flat {rep_flat['elbo']:.1f}",
        flush=True)


if __name__ == "__main__":
  main()
