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
WARMUP = 3
STEPS = 30


def main():
  import jax

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks

  vae = BetaVAE(beta=1.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  step = vae.make_step_fn(learning_rate=1e-3)
  state = parallel.replicate(vae.state)
  X = (np.random.RandomState(0).rand(BATCH, 64, 64, 1) < 0.5).astype("f")
  batch = parallel.shard_batch(X)
  for _ in range(WARMUP):
    state, m = step(state, batch)
  jax.block_until_ready(m)
  t0 = time.time()
  for _ in range(STEPS):
    state, m = step(state, batch)
  jax.block_until_ready(m)
  dt = time.time() - t0
  value = STEPS / dt
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
