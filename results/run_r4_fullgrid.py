"""Round-4 headline runs: the ACTUAL dSprites benchmark at full size.

Every recorded disentanglement number through round 3 used a 65,536-image
procedural slice (8.9% of the grid).  This script runs the reference's own
protocol (VERDICT r3 task 1): the complete 737,280-combination factor grid
(``odin/networks/image_networks.py:936-1013`` budgets 400 epochs over the
663,552-image 90% train split; grid cardinalities
``fuel/image_data/shapes.py:113-119``), device-resident as uint8 (2.9 GB in
HBM, fp32 cast per batch on device), gym scored on 10,000 held-out images.

Budgets (reference sample budget = 400 x 663,552 = 265.4M train images):
  betavae4 / betavae8 : 4,147,200 steps @ batch 64   (265.4M images)
  factorvae (tc=35)   : 2,073,600 steps @ batch 128  (same; the reference
                        splits each batch into VAE/discriminator halves)
  adagvae             : 2,073,600 steps @ batch 64 pairs (128 images/step),
                        pairs differ in exactly ONE factor, both members
                        drawn from the train split only

Run one model:  python results/run_r4_fullgrid.py <betavae4|betavae8|factorvae|adagvae> [--steps N]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fullgrid")
REF_IMAGES = 400 * 663_552  # the reference budget in train images


def reference_lr():
  # init_lr 1e-3, ExponentialDecay 0.996 per 10k steps (reference
  # ``image_networks.py:936-1013``)
  return optax.exponential_decay(1e-3, transition_steps=10_000,
                                 decay_rate=0.996)


def build_pairs(ds, n_pairs: int, seed: int = 11) -> np.ndarray:
  """(n_pairs, 2) int32 flat grid indices; each pair shares 4 of 5 factors
  (one factor re-drawn), both members inside the TRAIN split."""
  total = int(np.prod(ds.factor_sizes))
  sizes = np.asarray(ds.factor_sizes)
  strides = np.concatenate([np.cumprod(sizes[::-1])[::-1][1:], [1]])
  perm = np.random.RandomState(ds.seed).permutation(total)
  train_idx = perm[:int(0.9 * total)]
  in_train = np.zeros(total, bool)
  in_train[train_idx] = True
  rng = np.random.RandomState(seed)
  grid = ds.grid_factors()
  out = np.empty((n_pairs, 2), np.int64)
  filled = 0
  while filled < n_pairs:
    n = min(n_pairs - filled, 1 << 20)
    i1 = train_idx[rng.randint(len(train_idx), size=n)]
    f2 = grid[i1].copy()
    j = rng.randint(len(sizes), size=n)
    f2[np.arange(n), j] = rng.randint(sizes[j])
    i2 = f2 @ strides
    # both members in train AND the changed factor strictly different
    # (n_changed=1 exactly, Locatello et al. 2020)
    keep = in_train[i2] & (i2 != i1)
    k = int(keep.sum())
    out[filled:filled + k, 0] = i1[keep]
    out[filled:filled + k, 1] = i2[keep]
    filled += k
  return out.astype(np.int32)


def make_pair_sample_fn(batch_size: int):
  def sample_fn(key, data):
    grid_u8, pairs = data
    idx = jax.random.randint(key, (batch_size,), 0, pairs.shape[0])
    p = pairs[idx]
    x1 = grid_u8[p[:, 0]].astype(jnp.float32) / 255.0
    x2 = grid_u8[p[:, 1]].astype(jnp.float32) / 255.0
    return (x1, x2)
  return sample_fn


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("model", choices=["betavae4", "betavae8", "factorvae",
                                    "adagvae"])
  ap.add_argument("--steps", type=int, default=0,
                  help="override the reference budget (for smoke tests)")
  ap.add_argument("--eval-samples", type=int, default=10_000)
  args = ap.parse_args()
  os.makedirs(OUT, exist_ok=True)

  t_setup = time.time()
  ds = dSprites(full_grid=True)
  nets = get_networks("dsprites", zdim=10)

  if args.model == "betavae4":
    vae = get_vae("betavae")(beta=4.0, **nets)
    batch, steps = 64, REF_IMAGES // 64
  elif args.model == "betavae8":
    vae = get_vae("betavae")(beta=8.0, **nets)
    batch, steps = 64, REF_IMAGES // 64
  elif args.model == "factorvae":
    vae = get_vae("factorvae")(tc_coef=35.0, discriminator_lr=1e-4, **nets)
    batch, steps = 128, REF_IMAGES // 128
  else:
    vae = get_vae("adaptivevae")(**nets)
    batch, steps = 64, REF_IMAGES // 128  # 64 pairs = 128 images per step
  if args.steps:
    steps = args.steps
  vae.build(seed=1)

  fit_kw = dict(n_steps=steps, batch_size=batch,
                learning_rate=reference_lr(), steps_per_call=2_000,
                global_clipnorm=100.0, seed=1)
  if args.model == "adagvae":
    grid_u8 = np.asarray(ds._render_grid_cached())
    pairs = build_pairs(ds, n_pairs=4_000_000)
    X = (grid_u8, pairs)
    fit_kw["sample_fn"] = make_pair_sample_fn(batch)
  else:
    X = ds.numpy("train", inc_labels=False)  # uint8 {0,255}, 2.7 GB
  print(f"[{args.model}] setup {time.time() - t_setup:.0f}s; "
        f"{steps} steps @ batch {batch}", flush=True)

  # in-loop full-state checkpoints: a tunnel stall or crash loses at most
  # 250k steps (the 06:46 stall cost 3.4M un-checkpointed steps), and the
  # whole run still compiles its fused step exactly ONCE; the pickle holds
  # params + optimizer moments + step, `keep_opt_states=True` resumes the
  # Adam moments exactly
  ckpt = os.path.join(OUT, f"{args.model}_fullgrid.ckpt.pkl")
  done = 0
  if os.path.exists(ckpt):
    vae.load_weights(ckpt)
    done = int(vae.state.step)
    print(f"[{args.model}] resuming from checkpoint at step {done}",
          flush=True)
  t0 = time.time()
  if done < steps:
    vae.fit_device_dataset(X, **{**fit_kw, "n_steps": steps - done,
                                 "keep_opt_states": done > 0,
                                 "checkpoint_path": ckpt,
                                 "checkpoint_freq": 250_000})
  dt = max(time.time() - t0, 1e-9)
  rate = (steps - done) / dt
  print(f"[{args.model}] {steps} steps in {dt:.0f}s = {rate:.0f} steps/s",
        flush=True)
  vae.save_weights(os.path.join(OUT, f"{args.model}_fullgrid.pkl"))

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=args.eval_samples, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{args.model}_report.txt"))
  gym.plot_latents_traverse(
      path=os.path.join(OUT, f"{args.model}_traverse.png"))
  gym.plot_correlation(
      path=os.path.join(OUT, f"{args.model}_correlation.png"))
  rep = {k: float(v) for k, v in rep.items() if np.isscalar(v)}
  # both metric protocols: the reference's own (already in `rep`) and
  # disentanglement_lib's — the protocol behind every published number
  # (posterior mean, pair batch 64, 10k votes, 20-bin MIG; see
  # results/fullgrid/eval_dlib_protocol.py for the full analysis)
  rep.update(
      betavae_score_dlib=float(gym.betavae_score(protocol="dlib")),
      factorvae_score_dlib=float(gym.factorvae_score(protocol="dlib")),
      mig_dlib=float(gym.mig_score(protocol="dlib")))
  rep.update(model=args.model, n_steps=steps, batch_size=batch,
             steps_per_sec=round(rate, 1), train_wallclock_sec=round(dt),
             train_images=steps * (batch * 2 if args.model == "adagvae"
                                   else batch),
             protocol="full 737,280-image grid, 90/5/5 split, "
                      f"{args.eval_samples} held-out eval")
  with open(os.path.join(OUT, f"{args.model}_fullgrid.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
