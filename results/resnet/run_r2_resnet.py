"""Round-2 SE-ResNet run: the CIFAR architecture's squeeze-excitation
residual trunk (reference ``resnets.py:36-718``; `get_networks('cifar10',
resnet=True)`) vs the plain conv trunk, trained head-to-head on 32x32
procedural Shapes3D (CIFAR itself is npz-gated — no egress), identical
bernoulli likelihood / zdim / budget, evaluated under the 10k-sample Gym
protocol.

Run (on the TPU chip):  python results/resnet/run_r2_resnet.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import optax

from odin_tpu.bay.vi import BetaVAE, DisentanglementGym
from odin_tpu.fuel.image_data.datasets import Shapes3D
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))
STEPS = 50_000
BATCH = 64


class Shapes3D32(Shapes3D):
  """32x32 render of the procedural Shapes3D — the CIFAR input shape."""

  _image_size = 32

  @property
  def name(self):
    return "shapes3d32"


def run_one(resnet: bool, ds, x_train):
  tag = "resnet" if resnet else "conv"
  nets = get_networks("cifar10", resnet=resnet, distribution="bernoulli",
                      zdim=10)
  vae = BetaVAE(beta=1.0, **nets).build(seed=1)
  n_params = sum(int(np.prod(p.shape))
                 for p in __import__("jax").tree.leaves(vae.state.params))
  sched = optax.exponential_decay(3e-4, transition_steps=10_000,
                                  decay_rate=0.996)
  t0 = time.time()
  vae.fit_device_dataset(x_train, n_steps=STEPS, batch_size=BATCH,
                         learning_rate=sched, steps_per_call=1000,
                         global_clipnorm=100.0, seed=1)
  dt = time.time() - t0
  rate = STEPS / dt
  print(f"[{tag}] {n_params / 1e6:.2f}M params, {STEPS} steps in {dt:.0f}s "
        f"({rate:.0f} steps/s)", flush=True)

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=10_000, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{tag}_r2_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, f"{tag}_r2_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, f"{tag}_r2_correlation.png"))
  rep = {k: (float(v) if np.isscalar(v) else v) for k, v in rep.items()
         if np.isscalar(v)}
  rep["steps_per_sec"] = round(rate, 1)
  rep["n_params"] = n_params
  vae.save_weights(os.path.join(OUT, f"{tag}_shapes3d32_r2_50k.pkl"))
  return rep


def main():
  ds = Shapes3D32(n_samples=8_192)
  x_train = ds.normalize255(ds.numpy("train", inc_labels=False))
  print(f"train corpus {x_train.shape} ({x_train.nbytes / 1e9:.2f} GB)",
        flush=True)
  results = {}
  for resnet in (True, False):
    tag = "resnet" if resnet else "conv"
    results[tag] = run_one(resnet, ds, x_train)
    print(json.dumps({tag: results[tag]}), flush=True)
  with open(os.path.join(OUT, "resnet_vs_conv_shapes3d32_50k.json"),
            "w") as f:
    json.dump(results, f, indent=1)
  print(json.dumps(results), flush=True)


if __name__ == "__main__":
  main()
