"""Renderer-parameterization control for the beta-VAE below-median question
(VERDICT r4 task 3, second branch; SPREAD.md names "procedural-renderer
sprite parameterization" as the remaining suspect after optimizer and
harness were ruled out).

No official dsprites.npz exists on this box (offline), so the control is a
sprite-parameter sweep: the SAME full-grid protocol with the sprite
half-size mapping lifted from ``0.06 + 0.18*scale`` (smallest sprite
~7.7 px across — near the 64px resolution floor, where the renderer's
binary masks quantize hardest) to ``0.10 + 0.15*scale`` (smallest ~12.8 px,
largest ~unchanged).  If the tiny-sprite floor is what depresses the
beta-VAE scores, they move here; if they stay in the 0.61-0.73 BetaVAE* /
0.01-0.04 MIG* band, the parameterization is exonerated alongside the
optimizer and the harness.

Run:  python results/fullgrid/run_renderer_control.py [--seeds 2 3] [--steps 300000]
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

from odin_tpu.bay.vi import DisentanglementGym, get_vae
from odin_tpu.fuel import dSprites
from odin_tpu.networks import get_networks
from odin_tpu.training.core import (
    multiseed_device_dataset_steps, stack_states, unstack_states)

OUT = os.path.dirname(os.path.abspath(__file__))

# target half-size mapping: s = SMIN + SSLOPE * scale_norm
SMIN, SSLOPE = 0.10, 0.15
# the renderer hard-codes s = 0.06 + 0.18 * scale_in, so feed
# scale_in = (SMIN - 0.06 + SSLOPE * scale_norm) / 0.18
_BASE_MIN, _BASE_SLOPE = 0.06, 0.18


class dSpritesBigSprites(dSprites):
  """dSprites with the lifted sprite-size mapping (own full-grid cache)."""

  @property
  def name(self):
    return "dspritesbig"

  def _factors_to_values(self, f):
    shape_id, scale, orient, pos_x, pos_y = super()._factors_to_values(f)
    scale = (SMIN - _BASE_MIN + SSLOPE * scale) / _BASE_SLOPE
    return shape_id, scale, orient, pos_x, pos_y


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--seeds", type=int, nargs="+", default=[2, 3])
  ap.add_argument("--steps", type=int, default=300_000)
  ap.add_argument("--eval-samples", type=int, default=10_000)
  args = ap.parse_args()

  ds = dSpritesBigSprites(full_grid=True)
  X = ds.numpy("train", inc_labels=False)
  kk = args.steps // 1000
  todo = [s for s in args.seeds if not os.path.exists(
      os.path.join(OUT, f"betavae4bigsprite_seed{s}_{kk}k.json"))]
  if not todo:
    print("all seeds already done", flush=True)
    return
  t0 = time.time()
  vae = get_vae("betavae")(beta=4.0, **get_networks("dsprites", zdim=10))
  states, raw = [], None
  for s in todo:
    vae.build(seed=s)
    # Locatello's exact constant-1e-4 Adam: matches the betavae4lr1e4
    # baseline rows so the ONLY difference is the sprite parameterization
    raw = vae.make_step_fn(learning_rate=1e-4, global_clipnorm=100.0,
                           jit=False)
    states.append(jax.device_get(vae.state))
  k = 2_000
  fused = jax.jit(multiseed_device_dataset_steps(raw, 64, k, seeds=todo),
                  donate_argnums=(0,))
  data = jax.device_put(jnp.asarray(X))
  stacked = stack_states(states)
  done = 0
  while done < args.steps:
    stacked, m = fused(stacked, data)
    done += k
    if done % 50_000 == 0:
      print(f"[seeds {todo}] #{done} "
            f"({done / (time.time() - t0):.0f} steps/s)", flush=True)
  rate = args.steps / (time.time() - t0)
  for s, lane in zip(todo, unstack_states(jax.device_get(stacked))):
    vae.state = lane
    vae.step = int(lane.step)
    vae.save_weights(os.path.join(OUT, f"betavae4bigsprite_seed{s}_{kk}k.pkl"))
    gym = DisentanglementGym(dataset=ds, model=vae, batch_size=256)
    gym.run_model(n_samples=args.eval_samples, partition="test")
    rep = dict(seed=s, n_steps=args.steps, steps_per_sec=round(rate, 1),
               sprite_halfsize=f"{SMIN}+{SSLOPE}*scale (base 0.06+0.18)",
               kl_unweighted=float(gym.kl_unweighted()),
               log_likelihood=float(gym.log_likelihood()))
    for proto in ("reference", "dlib"):
      rep[f"betavae_score_{proto}"] = float(gym.betavae_score(protocol=proto))
      rep[f"factorvae_score_{proto}"] = float(
          gym.factorvae_score(protocol=proto))
      rep[f"mig_{proto}"] = float(gym.mig_score(protocol=proto))
    with open(os.path.join(OUT, f"betavae4bigsprite_seed{s}_{kk}k.json"),
              "w") as f:
      json.dump(rep, f, indent=1)
    print(json.dumps(rep), flush=True)


if __name__ == "__main__":
  main()
