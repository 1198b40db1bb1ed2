"""Round-2 BetaVAE on the image HalfMoons toy (reference ``toys.py:93``
semantics: 64x64x3 marker renders, factors [pos_x, pos_y, label, color,
shape]) — end-to-end validation of the new `HalfMoonsImage` dataset + the
Gym's mixed continuous/categorical factor handling on TPU.

Run (on the TPU chip):  python results/halfmoons_img/run_r2_halfmoons.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.vi import BetaVAE, DisentanglementGym
from odin_tpu.fuel import HalfMoonsImage
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 50_000
BATCH = 64


def main():
  t0 = time.time()
  ds = HalfMoonsImage(n_samples_per_factors=32)  # 1,280 images
  x_train = ds.numpy("train", inc_labels=False)
  print(f"rendered corpus {x_train.shape} in {time.time() - t0:.0f}s",
        flush=True)

  nets = get_networks("shapes3d", zdim=8)  # 64x64x3 conv trunk
  vae = BetaVAE(beta=4.0, **nets).build(seed=1)
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

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=64)
  gym.run_model(n_samples=128, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, "halfmoons_r2_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT,
                                              "halfmoons_r2_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT,
                                         "halfmoons_r2_correlation.png"))
  gym.plot_reconstruction(path=os.path.join(OUT, "halfmoons_r2_recon.png"))
  rep = {k: float(v) for k, v in rep.items() if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  with open(os.path.join(OUT, "halfmoons_r2_50k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  vae.save_weights(os.path.join(OUT, "halfmoons_r2_50k.pkl"))
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
