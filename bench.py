"""Benchmark: beta-VAE train steps/sec/chip on the dSprites conv architecture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (recorded 2026-08-16, see BASELINE.md): the same jitted training
step on the host CPU of this machine (1 core) runs at 0.135 steps/sec with
batch 64 — the stand-in for the reference's CPU throughput since the
reference publishes no numbers (SURVEY.md §6).
"""
import json
import time

import numpy as np

CPU_BASELINE_STEPS_PER_SEC = 0.135  # measured: 1-core CPU, batch 64, zdim 10
BATCH = 64
SCAN_STEPS = 500  # optimizer updates fused per device call (lax.scan);
# measured 1183/1248/1298/1315 steps/s at K=100/200/500/1000 — 500 takes
# nearly all the fusion gain at half the compile time of 1000
WARMUP = 1
CALLS = 3


def main():
  import jax

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import scan_steps

  vae = BetaVAE(beta=1.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  step = vae.make_step_fn(learning_rate=1e-3, jit=False)
  fused = jax.jit(scan_steps(step, SCAN_STEPS), donate_argnums=(0,))
  state = parallel.replicate(vae.state)
  from jax.sharding import NamedSharding, PartitionSpec as P
  X = (np.random.RandomState(0).rand(SCAN_STEPS, BATCH, 64, 64, 1)
       < 0.5).astype("f")
  mesh = parallel.default_mesh()
  # scan axis replicated, batch axis sharded over 'data'
  batches = jax.device_put(
      X, NamedSharding(mesh, P(None, "data", None, None, None)))
  for _ in range(WARMUP):
    state, m = fused(state, batches)
  jax.block_until_ready(m)
  t0 = time.time()
  for _ in range(CALLS):
    state, m = fused(state, batches)
  jax.block_until_ready(m)
  dt = time.time() - t0
  value = CALLS * SCAN_STEPS / dt
  n_chips = len(jax.devices())
  per_chip = value / max(n_chips, 1)
  print(json.dumps({
      "metric": "betavae_dsprites_train_steps_per_sec_per_chip",
      "value": round(per_chip, 3),
      "unit": "steps/sec/chip (batch 64)",
      "vs_baseline": round(per_chip / CPU_BASELINE_STEPS_PER_SEC, 2),
  }))


if __name__ == "__main__":
  main()
