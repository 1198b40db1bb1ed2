"""First-conv layout study: plain Conv(32,4,2) vs the exact space-to-depth
rewrite (`SpaceToDepthConv`) in the full MXU-bound training step.

The thin-channel first conv is the documented MXU bottleneck of the
reference-width trunk (BASELINE.md: it contracts 4*4*1=16 elements against
the 128-wide systolic array and a 64x64x1 input leaves the lane dim almost
empty).  The s2d form presents identical math as a 33x33x4 image under a
2x2x4 kernel.  Whether XLA tiles that better is an empirical layout
question — this script answers it with the full batch-128 device-resident
bf16 training config on both variants.

Run:  python benchmarks/first_conv_bench.py

Measured 2026-08-18 (TPU v5e 1 chip, batch 128 device-resident bf16,
100-step scans, 2 timed calls):

| first conv | steps/s/chip | images/s | MFU (bf16 peak) |
|------------|--------------|----------|-----------------|
| plain Conv(32,4,2) | 1087.3 | 139.2k | 15.25% |
| SpaceToDepthConv   | 1089.7 | 139.5k | 15.29% |

NEGATIVE RESULT, recorded deliberately: +0.2% is noise.  XLA's TPU conv
lowering already handles the thin-channel 64x64x1 first conv efficiently
at this size — the residual MFU gap at reference width lives in the
decoder transpose-convs and the VPU-bound objective (sampling/KL), not in
the input layout.  `SpaceToDepthConv` stays available (identical math,
identical param pytree) for architectures where the first conv IS the
bottleneck (larger images / deeper first-layer channel counts).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  import bench

  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks

  for s2d in (False, True):
    def factory(s2d=s2d):
      return BetaVAE(beta=1.0,
                     **get_networks("dsprites", zdim=10,
                                    space_to_depth=s2d)).build(seed=1)

    steps, mfu = bench.run_mxu_config(factory, batch=128, scan_steps=100,
                                      calls=2)
    print(json.dumps({
        "first_conv": "space_to_depth" if s2d else "conv4s2",
        "steps_per_sec_per_chip": round(steps, 1),
        "images_per_sec": round(steps * 128),
        "mfu_bf16_peak": round(mfu, 4) if mfu else None,
    }), flush=True)


if __name__ == "__main__":
  main()
