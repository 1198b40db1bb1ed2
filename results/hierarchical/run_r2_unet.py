"""Round-2 skip-connection run: UnetVAE (encoder->decoder skips at each
resolution, reference ``hierarchical_vae.py:905``) on procedural dSprites,
evaluated under the same 10k-sample Gym protocol as the ladder/flat entries
so the three architectures are directly comparable in results/README.md.

Run (on the TPU chip):  python results/hierarchical/run_r2_unet.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

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
  vae = UnetVAE(**nets).build(seed=1)
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
  rep = gym.write_report(path=os.path.join(OUT, "unet_r2_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, "unet_r2_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, "unet_r2_correlation.png"))
  gym.plot_histogram(path=os.path.join(OUT, "unet_r2_histogram.png"))
  rep = {k: (float(v) if np.isscalar(v) else v) for k, v in rep.items()
         if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  with open(os.path.join(OUT, "unet_dsprites_r2_50k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  vae.save_weights(os.path.join(OUT, "unet_dsprites_r2_50k.pkl"))
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
