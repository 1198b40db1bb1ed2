"""Round-4 stage-3: the full Shapes3D benchmark grid.

Same protocol as results/run_r4_fullgrid.py (the reference's benchmark
setting, ``odin/networks/image_networks.py:936-1013``) on the SECOND
benchmark dataset: the complete 480,000-combination Shapes3D factor grid
(``fuel/image_data/shapes.py:192`` cardinalities 15*8*4*10*10*10),
device-resident as uint8 (5.9 GB in HBM), 90/5/5 split, 10,000 held-out
images scored by the gym.  Budget = 400 epochs x 432,000 train images =
172.8M images (2.7M steps @ batch 64).

Run one model:  python results/run_r4_shapes3d.py <betavae4|adagvae> [--steps N]
"""
import argparse
import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import Shapes3D
from odin_tpu.networks import get_networks

_spec = importlib.util.spec_from_file_location(
    "run_r4_fullgrid",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "run_r4_fullgrid.py"))
_fg = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_fg)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fullgrid")
REF_IMAGES = 400 * 432_000


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("model", choices=["betavae4", "adagvae", "factorvae"])
  ap.add_argument("--steps", type=int, default=0)
  ap.add_argument("--eval-samples", type=int, default=10_000)
  args = ap.parse_args()
  os.makedirs(OUT, exist_ok=True)
  tag = f"{args.model}_shapes3d"

  t_setup = time.time()
  ds = Shapes3D(full_grid=True)
  nets = get_networks("shapes3d", zdim=10)
  if args.model == "betavae4":
    vae = get_vae("betavae")(beta=4.0, **nets)
    batch, steps = 64, REF_IMAGES // 64
  elif args.model == "factorvae":
    # tc=7 is the judge-named Shapes3D operating point (dSprites used 35)
    vae = get_vae("factorvae")(tc_coef=7.0, discriminator_lr=1e-4, **nets)
    batch, steps = 128, REF_IMAGES // 128
  else:
    vae = get_vae("adaptivevae")(**nets)
    batch, steps = 64, REF_IMAGES // 128
  if args.steps:
    steps = args.steps
  vae.build(seed=1)

  fit_kw = dict(n_steps=steps, batch_size=batch,
                learning_rate=_fg.reference_lr(), steps_per_call=2_000,
                global_clipnorm=100.0, seed=1)
  if args.model == "adagvae":
    # ship the grid FLAT (rows x 12288 uint8): with the image kept 4-D the
    # TPU compiler inserts a gather-layout copy of the whole grid whose
    # 3-channel minor dim pads 2x (u8[480000,64,64,3] -> 10.99G HLO temp,
    # OOM: 16.54G > 15.75G HBM).  A 2-D row gather is pad-free; reshape to
    # images after the per-batch gather.
    grid_u8 = np.ascontiguousarray(
        np.asarray(ds._render_grid_cached()).reshape(len(ds.grid_factors()),
                                                     -1))
    pairs = _fg.build_pairs(ds, n_pairs=4_000_000)
    X = (grid_u8, pairs)
    img_shape = ds.shape

    def pair_sample_fn(key, data):
      g, pp = data
      idx = jax.random.randint(key, (batch,), 0, pp.shape[0])
      p = pp[idx]
      x1 = (g[p[:, 0]].astype(jnp.float32) / 255.0).reshape(
          (batch,) + img_shape)
      x2 = (g[p[:, 1]].astype(jnp.float32) / 255.0).reshape(
          (batch,) + img_shape)
      return (x1, x2)

    fit_kw["sample_fn"] = pair_sample_fn
  else:
    X = ds.numpy("train", inc_labels=False)  # uint8, 5.3 GB
  print(f"[{tag}] setup {time.time() - t_setup:.0f}s; "
        f"{steps} steps @ batch {batch}", flush=True)

  ckpt = os.path.join(OUT, f"{tag}_fullgrid.ckpt.pkl")
  done = 0
  if os.path.exists(ckpt):
    vae.load_weights(ckpt)
    done = int(vae.state.step)
    print(f"[{tag}] resuming from checkpoint at step {done}", flush=True)
  t0 = time.time()
  if done < steps:
    vae.fit_device_dataset(X, **{**fit_kw, "n_steps": steps - done,
                                 "keep_opt_states": done > 0,
                                 "checkpoint_path": ckpt,
                                 "checkpoint_freq": 250_000})
  dt = max(time.time() - t0, 1e-9)
  rate = (steps - done) / dt
  print(f"[{tag}] {steps} steps in {dt:.0f}s = {rate:.0f} steps/s",
        flush=True)
  vae.save_weights(os.path.join(OUT, f"{tag}_fullgrid.pkl"))

  gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
  gym.run_model(n_samples=args.eval_samples, partition="test")
  rep = gym.write_report(path=os.path.join(OUT, f"{tag}_report.txt"))
  gym.plot_latents_traverse(path=os.path.join(OUT, f"{tag}_traverse.png"))
  gym.plot_correlation(path=os.path.join(OUT, f"{tag}_correlation.png"))
  rep = {k: float(v) for k, v in rep.items() if np.isscalar(v)}
  # both metric protocols (VERDICT r4 task 2): the reference's own (already
  # in `rep`) and disentanglement_lib's published protocol (posterior mean,
  # pair batch 64, 10k votes, 20-bin MIG)
  rep.update(
      betavae_score_dlib=float(gym.betavae_score(protocol="dlib")),
      factorvae_score_dlib=float(gym.factorvae_score(protocol="dlib")),
      mig_dlib=float(gym.mig_score(protocol="dlib")))
  rep.update(model=tag, n_steps=steps, batch_size=batch,
             steps_per_sec=round(rate, 1), train_wallclock_sec=round(dt),
             train_images=steps * (batch * 2 if args.model == "adagvae"
                                   else batch),
             protocol="full 480,000-image Shapes3D grid, 90/5/5 split, "
                      f"{args.eval_samples} held-out eval")
  with open(os.path.join(OUT, f"{tag}_fullgrid.json"), "w") as f:
    json.dump(rep, f, indent=1)
  print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
