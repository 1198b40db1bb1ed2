"""Decoder up-sampling layouts on TPU: ConvTranspose vs pixel-shuffle vs
resize-conv.

Transposed convolution lowers to a strided/dilated conv that leaves the MXU
partially idle and is HBM-heavy; the TPU-native alternatives are (a) a
regular 3x3 conv producing C*r^2 channels followed by a free depth-to-space
relayout, and (b) nearest-resize + 3x3 conv.  This benchmark swaps ONLY the
two up-sampling stages of the dSprites decoder and measures the full fused
training step (batch 256 device-resident, bf16 matmul — the MXU-bound
config of bench.py) for each variant.

Measured 2026-08-18 (TPU v5e, 1 chip, 100-step scans, 2 calls; all
variants reach the same loss after the warmup call):

| decoder upsampling      | steps/s/chip | params | vs ConvTranspose |
|-------------------------|--------------|--------|------------------|
| ConvTranspose(4, s2)    | **202**      | 395k   | 1.00x            |
| conv 3x3 + DepthToSpace | 165          | 446k   | 0.82x            |
| resize + conv 3x3       | 90           | 377k   | 0.45x            |

NEGATIVE RESULT, kept as design guidance: the folk rule "replace
ConvTranspose with pixel-shuffle on TPU" does NOT hold for this small-
channel VAE decoder — XLA lowers the k4/s2 transposed conv to an efficient
gradient-of-conv at these widths, while the pixel-shuffle variant pays for
4x-wider conv outputs and the resize-conv doubles the spatial work before
convolving.  The stock dSprites/CIFAR decoders therefore keep
ConvTranspose; `DepthToSpace`/`Resampling2D` remain available for the
wide-channel regimes where the trade flips.

Run:  python benchmarks/decoder_upsampling_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

BATCH = 256
SCAN = 100
CALLS = 2


def make_decoder(mode: str):
  from odin_tpu.networks import DepthToSpace, Resampling2D
  from odin_tpu.networks.base import (Conv, ConvTranspose, Dense, Reshape,
                                      SequentialNetwork)
  from odin_tpu.networks.image_networks import PackImageParams

  def up(ch):
    if mode == "convtranspose":
      return (ConvTranspose(ch, 4, 2, "elu"),)
    if mode == "pixelshuffle":
      return (Conv(ch * 4, 3, 1, "elu"), DepthToSpace(2))
    if mode == "resizeconv":
      return (Resampling2D(2.0), Conv(ch, 3, 1, "elu"))
    raise ValueError(mode)

  layers = (Dense(16 * 16 * 8, activation=None), Reshape((16, 16, 8)),
            *up(64), Conv(64, 4, 1, "elu"),
            *up(32), Conv(32, 4, 1, "elu"),
            Conv(1, 1, 1, None), PackImageParams(1))
  return SequentialNetwork(layers, name="decoder")


def run(mode: str):
  import jax

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import device_dataset_steps

  nets = get_networks("dsprites", zdim=10)
  nets["decoder"] = make_decoder(mode)
  with jax.default_matmul_precision("bfloat16"):
    vae = BetaVAE(beta=1.0, **nets).build(seed=1)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(vae.state.params))
    raw = vae.make_step_fn(learning_rate=1e-3, jit=False)
    data = jax.device_put(
        (np.random.RandomState(1).rand(16384, 64, 64, 1) < 0.5).astype("f"))
    fused = jax.jit(device_dataset_steps(raw, BATCH, SCAN, seed=0),
                    donate_argnums=(0,))
    state = parallel.replicate(vae.state)
    state, m = fused(state, data)   # compile + warmup
    jax.block_until_ready(m)
    t0 = time.time()
    for _ in range(CALLS):
      state, m = fused(state, data)
    jax.block_until_ready(m)
    dt = time.time() - t0
  return dict(mode=mode, steps_per_sec=round(CALLS * SCAN / dt, 1),
              n_params=n_params, loss=float(m["loss"]))


def main():
  results = [run(m) for m in ("convtranspose", "pixelshuffle", "resizeconv")]
  base = results[0]["steps_per_sec"]
  for r in results:
    r["speedup_vs_convtranspose"] = round(r["steps_per_sec"] / base, 3)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
  main()
