"""Re-evaluate recorded dSprites full-grid checkpoints under the round-5
dlib estimator (ADVICE r4: disentanglement_lib scores its beta-VAE /
FactorVAE classifiers on a held-out 5k eval vote set; the round-4 numbers
reported TRAINING accuracy on the 10k train votes).  Updates each row's
``*_dlib`` fields in place and preserves the old values as
``*_dlib_trainacc`` so every leaderboard row (dSprites r4, Shapes3D r5,
trunk study r5) carries the SAME protocol.

Run:  python results/fullgrid/reeval_dlib_r5.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks

OUT = os.path.dirname(os.path.abspath(__file__))

JOBS = [
    # (json name, pkl name, model factory kwargs)
    ("betavae4_fullgrid", "betavae4_fullgrid.pkl", "betavae", dict(beta=4.0)),
    ("betavae8_fullgrid", "betavae8_fullgrid.pkl", "betavae", dict(beta=8.0)),
    ("factorvae_fullgrid", "factorvae_fullgrid.pkl", "factorvae",
     dict(tc_coef=35.0, discriminator_lr=1e-4)),
    ("adagvae_fullgrid", "adagvae_fullgrid.pkl", "adaptivevae", dict()),
] + [
    (f"betavae4{tag}_seed{s}_300k", f"betavae4{tag}_seed{s}_300k.pkl",
     "betavae", dict(beta=4.0))
    for tag in ("", "lr1e4") for s in (2, 3, 4, 5)
]


def main():
  ds = dSprites(full_grid=True)
  for name, pkl, vae_name, kw in JOBS:
    jpath = os.path.join(OUT, f"{name}.json")
    ppath = os.path.join(OUT, pkl)
    if not (os.path.exists(jpath) and os.path.exists(ppath)):
      print(f"[{name}] missing json/pkl, skipped", flush=True)
      continue
    rep = json.load(open(jpath))
    if "betavae_score_dlib_trainacc" in rep:
      print(f"[{name}] already re-evaluated", flush=True)
      continue
    t0 = time.time()
    vae = get_vae(vae_name)(**kw, **get_networks("dsprites", zdim=10))
    vae.build(seed=1)
    vae.load_weights(ppath)
    gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
    gym.run_model(n_samples=10_000, partition="test")
    for key, fn in (("betavae_score", gym.betavae_score),
                    ("factorvae_score", gym.factorvae_score),
                    ("mig", gym.mig_score)):
      old = rep.get(f"{key}_dlib")
      new = float(fn(protocol="dlib"))
      if old is not None:
        rep[f"{key}_dlib_trainacc"] = old
      rep[f"{key}_dlib"] = new
      print(f"[{name}] {key}_dlib {old} -> {new:.4f}", flush=True)
    rep["dlib_eval_protocol"] = ("10k train votes, 5k held-out eval votes "
                                 "(r5; r4 *_trainacc = train accuracy)")
    with open(jpath, "w") as f:
      json.dump(rep, f, indent=1)
    print(f"[{name}] done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
  main()
