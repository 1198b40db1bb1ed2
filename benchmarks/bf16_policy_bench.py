"""Mixed-precision policy study: fp32 step (bf16 matmul precision only) vs
the full bf16 compute policy (`make_step_fn(compute_dtype=bfloat16)` —
params + activations cast to bf16 inside the loss, fp32 master weights).

Round-1 measured only 1.03x for ad-hoc full-bf16 at batch 64 (dispatch-
bound).  This re-measures at the MXU-bound operating point (batch 128,
device-resident corpus, 100-step scans) where HBM traffic and VPU work —
the two things the policy halves — actually bound the step.

Run:  python benchmarks/bf16_policy_bench.py

Measured 2026-08-19 (TPU v5e 1 chip, batch 128 device-resident, 100-step
scans): fp32 1125.5 steps/s vs bf16 policy 1152.8 steps/s (+2.4%), same
loss trajectory (2839.7 vs 2833.2 after 400 steps).  NEGATIVE result at
reference width — see BASELINE.md "bf16 compute-policy study".
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(compute_dtype, batch=128, n_images=16384, scan_steps=100, calls=3):
  import jax
  import jax.numpy as jnp

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import device_dataset_steps

  vae = BetaVAE(beta=1.0,
                **get_networks("dsprites", zdim=10)).build(seed=1)
  raw = vae.make_step_fn(learning_rate=1e-3, jit=False,
                         compute_dtype=compute_dtype)
  data = jax.device_put(
      (np.random.RandomState(1).rand(n_images, 64, 64, 1) < 0.5)
      .astype("f"))
  state = parallel.replicate(vae.state)
  fused = jax.jit(device_dataset_steps(raw, batch, scan_steps, seed=0),
                  donate_argnums=(0,))
  state, m = fused(state, data)
  jax.block_until_ready(m)
  t0 = time.time()
  for _ in range(calls):
    state, m = fused(state, data)
  jax.block_until_ready(m)
  dt = time.time() - t0
  loss = float(jax.device_get(m["loss"]))
  return calls * scan_steps / dt, loss


def main():
  import jax.numpy as jnp

  for name, dtype in (("fp32", None), ("bf16_policy", jnp.bfloat16)):
    steps, loss = run(dtype)
    print(json.dumps({
        "policy": name,
        "steps_per_sec_per_chip": round(steps, 1),
        "images_per_sec": round(steps * 128),
        "loss_after_400_steps": round(loss, 3),
    }), flush=True)


if __name__ == "__main__":
  main()
