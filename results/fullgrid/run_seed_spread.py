"""BetaVAE(beta=4) seed-spread study on the full 737,280-image grid.

The full-budget betavae4 run (run_r4_fullgrid.py, seed 1) landed below the
published medians; the stated explanation is the canonical single-seed
beta-VAE spread (Locatello et al. 2019 Fig. 4: on dSprites the SAME recipe
spans FactorVAE-score ~0.4-0.95 and MIG ~0.0-0.35 across 50 seeds).  This
script puts that explanation on in-repo evidence: train N additional seeds
at the Locatello budget class (300k steps @ batch 64 — scores saturate well
before the 4.15M-step reference budget) and record the spread under both
metric protocols (reference + dlib; see eval_dlib_protocol.py).

TPU-native twist: by default ALL seeds train as ONE vmapped XLA program
(`training.core.multiseed_device_dataset_steps`) — one compile, the seeds'
convolutions batched into shared kernels (the single-model step leaves the
MXU 83% idle, BASELINE.md), per-lane batch streams bit-identical to
standalone runs (tests/test_multiseed.py).  `--no-vmap` falls back to
sequential runs (S compiles).

Usage: python results/fullgrid/run_seed_spread.py [--seeds 2 3 4] [--steps N]
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
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks
from odin_tpu.networks.image_networks import locatello_networks
from odin_tpu.training.core import (
    multiseed_device_dataset_steps, stack_states, unstack_states)

OUT = os.path.dirname(os.path.abspath(__file__))


def make_nets(trunk: str):
  if trunk == "dlib":
    return locatello_networks(zdim=10)
  return get_networks("dsprites", zdim=10)


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
  ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3, 4, 5])
  ap.add_argument("--steps", type=int, default=300_000)
  ap.add_argument("--eval-samples", type=int, default=10_000)
  ap.add_argument("--no-vmap", action="store_true")
  ap.add_argument("--lr", type=float, default=0.0,
                  help="constant Adam lr (e.g. 1e-4 = Locatello et al.'s "
                       "exact optimizer); 0 = the reference schedule "
                       "(1e-3 exp-decay).  Discriminates recipe-level "
                       "from harness-level score differences: 5/5 seeds "
                       "under the reference recipe land in the entangled "
                       "low tail while FactorVAE/Ada-GVAE reach their "
                       "published medians on the same harness/data/eval.")
  ap.add_argument("--tag", default="",
                  help="filename tag, e.g. 'lr1e4' -> "
                       "betavae4lr1e4_seed2_300k.json")
  ap.add_argument("--trunk", default="ref", choices=["ref", "dlib"],
                  help="conv trunk: 'ref' = the reference's elu 4-4-4-4 "
                       "trunk (dsprites_networks); 'dlib' = "
                       "disentanglement_lib's exact ReLU trunk "
                       "(locatello_networks) — the round-5 discriminating "
                       "experiment (VERDICT r4 task 3: is the below-median "
                       "beta-VAE disentanglement an architecture effect?)")
  args = ap.parse_args()

  ds = dSprites(full_grid=True)
  X = ds.numpy("train", inc_labels=False)
  kk = args.steps // 1000
  lr = args.lr if args.lr > 0 else reference_lr()
  name = "betavae4" + args.tag

  if not args.no_vmap:
    todo = [s for s in args.seeds if not os.path.exists(
        os.path.join(OUT, f"{name}_seed{s}_{kk}k.json"))]
    if not todo:
      print("all seeds already done", flush=True)
      return
    t0 = time.time()
    vae = get_vae("betavae")(beta=4.0, **make_nets(args.trunk))
    states, raw = [], None
    for s in todo:
      vae.build(seed=s)
      raw = vae.make_step_fn(learning_rate=lr,
                             global_clipnorm=100.0, jit=False)
      states.append(jax.device_get(vae.state))
    k = 2_000
    fused = jax.jit(
        multiseed_device_dataset_steps(raw, 64, k, seeds=todo),
        donate_argnums=(0,))
    data = jax.device_put(jnp.asarray(X))
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
      vae.save_weights(os.path.join(OUT, f"{name}_seed{s}_{kk}k.pkl"))
      rep = evaluate(vae, ds, s, args.steps, rate, args.eval_samples)
      rep["vmapped_lanes"] = len(todo)
      with open(os.path.join(OUT, f"{name}_seed{s}_{kk}k.json"),
                "w") as f:
        json.dump(rep, f, indent=1)
      print(json.dumps(rep), flush=True)
    return

  for seed in args.seeds:
    path = os.path.join(OUT, f"{name}_seed{seed}_{kk}k.json")
    if os.path.exists(path):
      print(f"[seed {seed}] already done", flush=True)
      continue
    t0 = time.time()
    vae = get_vae("betavae")(beta=4.0, **make_nets(args.trunk))
    vae.build(seed=seed)
    vae.fit_device_dataset(X, n_steps=args.steps, batch_size=64,
                           learning_rate=lr,
                           steps_per_call=2_000,
                           global_clipnorm=100.0, seed=seed)
    rep = evaluate(vae, ds, seed, args.steps,
                   args.steps / (time.time() - t0), args.eval_samples)
    with open(path, "w") as f:
      json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
