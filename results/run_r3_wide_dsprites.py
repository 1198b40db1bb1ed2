"""Round-3 production-width recorded run: BetaVAE at 4x trunk width.

Every recorded run so far uses the reference-width trunk (0.37M params,
~15% MFU — shape-bound, BASELINE.md).  This run records the framework at
the width where the conv contractions fill the 128-lane MXU (128-128-256-
256 trunk, 5.9M params, 44.6% MFU in the bench): a 50k-step training run
with the standard 10k-sample gym protocol, batch 128 (the measured
throughput-optimal point), bf16 matmul precision, device-resident corpus.

Run (on the TPU chip):  python results/run_r3_wide_dsprites.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import optax

from odin_tpu.bay.vi import BetaVAE, DisentanglementGym
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 50_000
BATCH = 128


def main():
  ds = dSprites(n_samples=65_536)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)

  vae = BetaVAE(beta=4.0,
                **get_networks("dsprites", zdim=10, width=4)).build(seed=1)
  n_params = sum(np.prod(l.shape) for l in
                 jax.tree_util.tree_leaves(vae.state.params))
  print(f"params: {n_params / 1e6:.2f}M", flush=True)
  sched = optax.exponential_decay(3e-4, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  with jax.default_matmul_precision("bfloat16"):
    vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                           learning_rate=sched, steps_per_call=1000,
                           global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"wide: {STEPS} steps in {dt:.0f}s = {rate:.0f} steps/s "
        f"({rate * BATCH / 1e3:.0f}k images/s)", flush=True)
  vae.save_weights(os.path.join(OUT, "betavae4_wide_dsprites_50k.pkl"))

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, "betavae4_wide_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, "betavae4_wide_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, "betavae4_wide_correlation.png"))
  rep = {k: (float(v) if np.isscalar(v) else v) for k, v in rep.items()
         if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  rep["params_m"] = round(float(n_params) / 1e6, 2)
  rep["config"] = "width=4 trunk, batch 128, bf16 matmul, beta=4"
  with open(os.path.join(OUT, "betavae4_wide_dsprites_50k.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
