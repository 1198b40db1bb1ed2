"""Batch scaling of the MXU-bound training config (one chip).

Sweeps the device-resident dSprites BetaVAE step (bf16 matmul, on-device
batch sampling — bench.py's `run_mxu_config`) over batch sizes and reports
steps/s, images/s, and MFU: the table that locates the throughput-optimal
operating point for corpus training.

Measured 2026-08-18 (TPU v5e 1 chip, 100-step scans, 2 timed calls):

| batch | steps/s/chip | images/s | MFU (bf16 peak) |
|-------|--------------|----------|-----------------|
| 64    | 1114         | 71k      | 7.8%            |
| 128   | 1068         | **137k** | **15.0%**       |
| 256   | 501          | 128k     | 14.1%           |
| 512   | 219          | 112k     | 12.3%           |
| 1024  | 109          | 112k     | 12.2%           |

Throughput PEAKS at batch 128: up to there the bigger convs amortize the
fixed per-step work (sampling, optimizer, loop overhead) almost for free;
beyond it the step cost grows super-linearly with batch (larger-than-VMEM
activations spill to HBM) while the flops stay fixed per image.  Batch 128
is the recommended corpus-training operating point on one v5e chip for
this architecture (BASELINE.md updated).

Run:  python benchmarks/batch_scaling_bench.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  import bench

  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks

  def factory():
    return BetaVAE(beta=1.0,
                   **get_networks("dsprites", zdim=10)).build(seed=1)

  for batch in (64, 128, 256, 512, 1024):
    steps, mfu = bench.run_mxu_config(factory, batch=batch, scan_steps=100,
                                      calls=2)
    print(json.dumps({
        "batch": batch,
        "steps_per_sec_per_chip": round(steps, 1),
        "images_per_sec": round(steps * batch),
        "mfu_bf16_peak": round(mfu, 4) if mfu else None,
    }), flush=True)


if __name__ == "__main__":
  main()
