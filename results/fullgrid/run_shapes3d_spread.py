"""FactorVAE(tc=7) seed-spread study on the full 480,000-image Shapes3D grid.

The full-budget FactorVAE Shapes3D row (run_r4_shapes3d.py, seed 1) landed
at FactorVAE* 0.760 — inside but below the published single-seed median
(Locatello et al. 2019 report FactorVAE-score spanning roughly 0.5-1.0
across 50 seeds on Shapes3D, median ~0.84).  As with the dSprites beta-VAE
rows, a single seed cannot distinguish "below median draw" from a recipe
effect; this script records the spread: N additional seeds at the Locatello
300k-step budget class, scored under both metric protocols.

TPU-native: all seeds train as ONE vmapped XLA program
(`training.core.multiseed_device_dataset_steps`) — the adversarial
two-optimizer FactorVAE update already compiles to a single fused step
(reference's two-session design, `odin/bay/vi/autoencoder/factor_vae.py:239`,
replaced by TrainStep partitions), so vmapping it batches all lanes'
convolutions AND discriminators into shared kernels.  The grid is shipped
FLAT (rows x 12288 uint8) with a reshape after the per-batch gather —
gathering from a device-resident (B,64,64,3) uint8 array makes the TPU
compiler build a 2x-padded gather-layout copy of the whole corpus
(10.99 GB HLO temp; the round-5 Ada-GVAE OOM, see CLAUDE.md).

Usage: python results/fullgrid/run_shapes3d_spread.py [--seeds 2 3 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import optax

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import Shapes3D
from odin_tpu.networks import get_networks
from odin_tpu.training.core import (
    multiseed_device_dataset_steps, stack_states, unstack_states)

OUT = os.path.dirname(os.path.abspath(__file__))
BATCH = 128  # the judge-named Shapes3D FactorVAE operating point (tc=7)


def reference_lr():
  return optax.exponential_decay(1e-3, transition_steps=10_000,
                                 decay_rate=0.996)


def evaluate(vae, ds, seed, steps, rate, n_eval):
  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=n_eval, partition="test")
  rep = dict(seed=seed, n_steps=steps, steps_per_sec=round(rate, 1),
             elbo=float(gym.elbo()),
             kl_divergence=float(gym.kl_divergence()),
             kl_unweighted=float(gym.kl_unweighted()),
             elbo_unweighted=float(gym.elbo_unweighted()),
             log_likelihood=float(gym.log_likelihood()))
  for proto in ("reference", "dlib"):
    rep[f"betavae_score_{proto}"] = gym.betavae_score(protocol=proto)
    rep[f"factorvae_score_{proto}"] = gym.factorvae_score(protocol=proto)
    rep[f"mig_{proto}"] = gym.mig_score(protocol=proto)
  return rep


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3, 4])
  ap.add_argument("--steps", type=int, default=300_000)
  ap.add_argument("--eval-samples", type=int, default=10_000)
  args = ap.parse_args()

  todo = [s for s in args.seeds if not os.path.exists(
      os.path.join(OUT, f"factorvae_shapes3d_seed{s}_"
                        f"{args.steps // 1000}k.json"))]
  if not todo:
    print("all seeds already done", flush=True)
    return

  ds = Shapes3D(full_grid=True)
  X = ds.numpy("train", inc_labels=False)  # uint8 (432k, 64, 64, 3)
  img_shape = ds.shape
  Xflat = np.ascontiguousarray(X.reshape(len(X), -1))
  del X

  def sample_fn(key, data):
    idx = jax.random.randint(key, (BATCH,), 0, data.shape[0])
    return (data[idx].astype(jnp.float32) / 255.0).reshape(
        (BATCH,) + img_shape)

  t0 = time.time()
  nets = get_networks("shapes3d", zdim=10)
  vae = get_vae("factorvae")(tc_coef=7.0, discriminator_lr=1e-4, **nets)
  states, raw = [], None
  for s in todo:
    vae.build(seed=s)
    raw = vae.make_step_fn(learning_rate=reference_lr(),
                           global_clipnorm=100.0, jit=False)
    states.append(jax.device_get(vae.state))
  k = 2_000
  fused = jax.jit(
      multiseed_device_dataset_steps(raw, BATCH, k, seeds=todo,
                                     sample_fn=sample_fn),
      donate_argnums=(0,))
  data = jax.device_put(jnp.asarray(Xflat))
  stacked = stack_states(states)
  done = 0
  while done < args.steps:
    stacked, m = fused(stacked, data)
    done += k
    rate = done / (time.time() - t0)
    mm = {key: np.asarray(v) for key, v in jax.device_get(m).items()}
    print(f"[seeds {todo}] #{done} " +
          " ".join(f"{key}:{np.round(v, 3)}" for key, v in mm.items()) +
          f" steps_per_sec:{rate:.0f} (x{len(todo)} models)", flush=True)
  rate = args.steps / (time.time() - t0)
  for s, lane in zip(todo, unstack_states(jax.device_get(stacked))):
    vae.state = lane
    vae.step = int(lane.step)
    kk = args.steps // 1000
    vae.save_weights(
        os.path.join(OUT, f"factorvae_shapes3d_seed{s}_{kk}k.pkl"))
    rep = evaluate(vae, ds, s, args.steps, rate, args.eval_samples)
    rep["vmapped_lanes"] = len(todo)
    with open(os.path.join(OUT, f"factorvae_shapes3d_seed{s}_{kk}k.json"),
              "w") as f:
      json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
