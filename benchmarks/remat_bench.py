"""Gradient rematerialization at spill-bound batch sizes (one chip).

The batch-scaling study (benchmarks/batch_scaling_bench.py) found per-step
cost growing super-linearly past batch 128 — larger-than-VMEM activations
spill to HBM during the backward pass.  `make_step_fn(remat=True)` trades
FLOPs for that memory: the backward pass recomputes forward activations
(`jax.checkpoint`) instead of keeping them resident.  This sweep measures
whether buying back activation memory buys back throughput at the
spill-bound points (batch 512 / 1024, device-resident bf16 config).

Results are recorded in BASELINE.md next to the other layout studies —
positive or negative, the number is the answer.

Run:  python benchmarks/remat_bench.py
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

  for batch in (512, 1024):
    for remat in (False, True):
      steps, mfu = bench.run_mxu_config(factory, batch=batch,
                                        scan_steps=100, calls=2,
                                        remat=remat)
      print(json.dumps({
          "batch": batch,
          "remat": remat,
          "steps_per_sec_per_chip": round(steps, 1),
          "images_per_sec": round(steps * batch),
          "mfu_bf16_peak": round(mfu, 4) if mfu else None,
      }), flush=True)


if __name__ == "__main__":
  main()
