"""BetaVAE(beta=4) seed-spread study on the full 737,280-image grid.

The full-budget betavae4 run (run_r4_fullgrid.py, seed 1) landed below the
published medians; the stated explanation is the canonical single-seed
beta-VAE spread (Locatello et al. 2019 Fig. 4: on dSprites the SAME recipe
spans FactorVAE-score ~0.4-0.95 and MIG ~0.0-0.35 across 50 seeds).  This
script puts that explanation on in-repo evidence: train N additional seeds
at the Locatello budget class (300k steps @ batch 64 — scores saturate well
before the 4.15M-step reference budget) and record the spread under both
metric protocols (reference + dlib; see eval_dlib_protocol.py).

Usage: python results/fullgrid/run_seed_spread.py [--seeds 2 3 4] [--steps N]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3, 4])
  ap.add_argument("--steps", type=int, default=300_000)
  ap.add_argument("--eval-samples", type=int, default=10_000)
  args = ap.parse_args()

  ds = dSprites(full_grid=True)
  X = ds.numpy("train", inc_labels=False)
  for seed in args.seeds:
    path = os.path.join(OUT, f"betavae4_seed{seed}_{args.steps // 1000}k.json")
    if os.path.exists(path):
      print(f"[seed {seed}] already done", flush=True)
      continue
    t0 = time.time()
    nets = get_networks("dsprites", zdim=10)
    vae = get_vae("betavae")(beta=4.0, **nets)
    vae.build(seed=seed)
    lr = optax.exponential_decay(1e-3, transition_steps=10_000,
                                 decay_rate=0.996)
    vae.fit_device_dataset(X, n_steps=args.steps, batch_size=64,
                           learning_rate=lr, steps_per_call=2_000,
                           global_clipnorm=100.0, seed=seed)
    dt = time.time() - t0
    gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
    gym.run_model(n_samples=args.eval_samples, partition="test")
    rep = dict(seed=seed, n_steps=args.steps,
               steps_per_sec=round(args.steps / dt, 1),
               elbo=float(gym.elbo()),
               kl_divergence=float(gym.kl_divergence()))
    for proto in ("reference", "dlib"):
      rep[f"betavae_score_{proto}"] = gym.betavae_score(protocol=proto)
      rep[f"factorvae_score_{proto}"] = gym.factorvae_score(protocol=proto)
      rep[f"mig_{proto}"] = gym.mig_score(protocol=proto)
    with open(path, "w") as f:
      json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
