"""Training dispatch: single jitted step vs k-step lax.scan fusion.

Quantifies the host->device round-trip amortization behind
`fit(steps_per_call=k)` (BASELINE.md).  Run on TPU:
`python benchmarks/scan_vs_single_step.py`
"""
import time

import numpy as np


def main(batch: int = 64, ks=(1, 10, 50, 100)):
  import jax
  from jax.sharding import NamedSharding, PartitionSpec as P

  from odin_tpu import parallel
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import scan_steps

  vae = BetaVAE(beta=1.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  raw = vae.make_step_fn(learning_rate=1e-3, jit=False)
  mesh = parallel.default_mesh()
  host = jax.device_get(vae.state)
  for k in ks:
    fn = jax.jit(raw) if k == 1 else jax.jit(scan_steps(raw, k))
    X = (np.random.RandomState(0).rand(max(k, 1), batch, 64, 64, 1)
         < 0.5).astype("f")
    b = jax.device_put(X[0] if k == 1 else X,
                       NamedSharding(mesh, P("data") if k == 1
                                     else P(None, "data")))
    state = parallel.replicate(host, mesh)
    state, m = fn(state, b)
    jax.block_until_ready(m)
    n_calls = max(200 // k, 2)
    t0 = time.time()
    for _ in range(n_calls):
      state, m = fn(state, b)
    jax.block_until_ready(m)
    sps = n_calls * k / (time.time() - t0)
    print(f"k={k:>3d}: {sps:8,.1f} steps/sec ({1e3 / sps:.3f} ms/step)")


if __name__ == "__main__":
  main()
