"""Decoder transpose-conv study: XLA's zero-dilated ConvTranspose vs the
exact subpixel parity decomposition (`_SubpixelConvTranspose`).

BASELINE.md identifies the transpose-conv decoder as the residual MXU
bottleneck of the reference-width trunk: XLA lowers a strided transposed
conv as a conv over the lhs_dilation-zero-stuffed input, so at stride 2
three quarters of the MXU contractions multiply zeros.  The subpixel form
computes the same math as ONE dense stride-1 conv to s*s*F channels +
depth-to-space (identical outputs, identical param pytree — see
tests/test_networks.py::test_subpixel_conv_transpose_exact).

This script times the full batch-128 device-resident bf16 training config
with both decoder lowerings.

Run:  python benchmarks/deconv_bench.py

Measured 2026-08-18 (TPU v5e 1 chip, batch 128 device-resident bf16,
100-step scans, 2 timed calls):

| decoder deconv | steps/s/chip | images/s | MFU (bf16 peak) |
|----------------|--------------|----------|-----------------|
| XLA conv_transpose (lhs_dilated) | 1078.7 | 138.1k | 15.1% |
| subpixel decomposition           |  877.1 | 112.3k | 23.8% |

NEGATIVE RESULT, recorded deliberately: the subpixel form is ~19% slower
end-to-end.  XLA's TPU lowering already rewrites the strided transposed
conv to avoid contracting the zero-stuffed rows (the "zeros on the MXU"
hypothesis does not hold), while the subpixel form pays a real
depth-to-space transpose on the full activation (HBM traffic) — its
higher reported MFU is cost-model flops inflation, not useful work.
`ConvTranspose(subpixel=True)` stays available (identical outputs, param
pytree and checkpoints) for channel-heavy small-spatial decoders where a
dense stride-1 conv could win.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_factory(subpixel: bool):
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.networks.base import ConvTranspose, SequentialNetwork

  def factory():
    nets = get_networks("dsprites", zdim=10)
    dec = nets["decoder"]
    layers = tuple(
        dataclasses.replace(l, subpixel=subpixel)
        if isinstance(l, ConvTranspose) else l for l in dec.layers)
    assert any(isinstance(l, ConvTranspose) for l in dec.layers)
    nets["decoder"] = SequentialNetwork(layers, name="decoder")
    return BetaVAE(beta=1.0, **nets).build(seed=1)

  return factory


def main():
  import bench

  for subpixel in (False, True):
    steps, mfu = bench.run_mxu_config(make_factory(subpixel), batch=128,
                                      scan_steps=100, calls=2)
    print(json.dumps({
        "deconv": "subpixel" if subpixel else "lhs_dilated",
        "steps_per_sec_per_chip": round(steps, 1),
        "images_per_sec": round(steps * 128),
        "mfu_bf16_peak": round(mfu, 4) if mfu else None,
    }), flush=True)


if __name__ == "__main__":
  main()
