"""Attack the production-width operating point (VERDICT r3 weak #4).

BASELINE.md records 44.6% MFU for the 4x-width trunk (batch 128-256, bf16
matmul) with the remaining 55% unattributed.  `train_step_profile.py
--width 4` captures the op-level trace; this bench measures the candidate
attacks as full fused-train-step steps/s + MFU so each hypothesis gets a
number:

  base        width-4, batch 128, fp32 params/activations + bf16 matmul
  batch256    the arithmetic-intensity lever
  bf16        full bf16 compute policy (fp32 master weights) — at 4x width
              HBM traffic should finally matter (it did not at width 1:
              +3% only, benchmarks/bf16_policy_bench.py)
  remat       jax.checkpoint on the step (trades flops for HBM)
  d2s         pixel-shuffle decoder (conv 3x3 + DepthToSpace) — the trade
              that LOST at width 1 (decoder_upsampling_bench.py) but was
              predicted to flip in wide-channel regimes
  combinations of the winners

Run on the TPU:  python benchmarks/wide_attack_bench.py [--variants base,bf16]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "results", "wide_attack.json")
WIDTH = 4


def wide_nets(decoder_mode: str = "convtranspose", s2d: bool = False):
  from odin_tpu.networks import DepthToSpace
  from odin_tpu.networks.base import (Conv, ConvTranspose, Dense, Reshape,
                                      SequentialNetwork)
  from odin_tpu.networks.image_networks import PackImageParams, \
      get_networks

  nets = get_networks("dsprites", zdim=10, width=WIDTH,
                      space_to_depth=s2d)
  if decoder_mode == "d2s":
    w = WIDTH

    def up(ch):
      return (Conv(ch * 4, 3, 1, "elu"), DepthToSpace(2))

    proj = 128 * w
    nets["decoder"] = SequentialNetwork(
        (Dense(proj, activation=None), Reshape((4, 4, proj // 16)),
         *up(64 * w), *up(64 * w), *up(32 * w), *up(32 * w),
         Conv(1, 1, 1, None), PackImageParams(1)), name="decoder")
  return nets


def run_variant(name: str):
  import jax
  import jax.numpy as jnp
  import bench

  kw = {}
  batch = 128
  decoder = "convtranspose"
  s2d = False
  for part in name.split("+"):
    if part == "base":
      pass
    elif part.startswith("batch"):
      batch = int(part[5:])
    elif part == "bf16":
      kw["compute_dtype"] = jnp.bfloat16
    elif part == "remat":
      kw["remat"] = True
    elif part == "d2s":
      decoder = "d2s"
    elif part == "s2d":
      s2d = True  # space-to-depth rewrite of the thin-channel first conv
    else:
      raise ValueError(part)

  from odin_tpu.bay.vi import BetaVAE

  def factory():
    return BetaVAE(beta=1.0, **wide_nets(decoder, s2d)).build(seed=1)

  steps_per_sec, mfu = bench.run_mxu_config(factory, batch=batch, **kw)
  imgs = steps_per_sec * batch
  print(f"{name:18s} {steps_per_sec:7.1f} steps/s  {imgs / 1e3:6.1f}k "
        f"img/s  MFU {100 * (mfu or 0):.1f}%", flush=True)
  return dict(variant=name, batch=batch, steps_per_sec=round(steps_per_sec, 1),
              images_per_sec=round(imgs), mfu=round(mfu or 0, 4))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--variants",
                  default="base,batch256,bf16,remat,d2s")
  args = ap.parse_args()
  rows = []
  if os.path.exists(OUT):
    rows = json.load(open(OUT))
  for v in args.variants.split(","):
    rows.append(run_variant(v.strip()))
    with open(OUT, "w") as f:
      json.dump(rows, f, indent=1)
  print(json.dumps(rows))


if __name__ == "__main__":
  main()
