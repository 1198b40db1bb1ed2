"""bfloat16 vs float32 matmul throughput and accuracy on the current backend.

TPU analogue of the reference's ``benchmarks/float16_vs_float32.py``: the
MXU natively multiplies bf16 with fp32 accumulation, so bf16 inputs roughly
double matmul throughput at ~3 decimal digits of precision — the numbers
here justify which kernels keep `Precision.HIGHEST` (the bit-exact DSP
path) and which can drop to bf16 (model forward/backward).

Run: ``python benchmarks/bf16_vs_f32.py`` (defaults to whatever backend
JAX selects; on the remote TPU budget ~1 min for the two compiles).
"""
import time

import numpy as np


def main(n: int = 2048, iters: int = 10):
  import jax
  import jax.numpy as jnp

  rng = np.random.RandomState(0)
  a = rng.randn(n, n).astype("f")
  b = rng.randn(n, n).astype("f")
  exact = a.astype("f8") @ b.astype("f8")

  results = {}
  for dtype in (jnp.float32, jnp.bfloat16):
    x = jnp.asarray(a, dtype)
    y = jnp.asarray(b, dtype)
    f = jax.jit(lambda x, y: (x @ y).astype(jnp.float32))
    out = jax.block_until_ready(f(x, y))
    t0 = time.time()
    for _ in range(iters):
      out = f(x, y)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    tflops = 2 * n ** 3 / dt / 1e12
    err = float(np.max(np.abs(np.asarray(out) - exact) /
                       (np.abs(exact) + 1.0)))
    results[str(dtype.__name__)] = (dt, tflops, err)
    print(f"{dtype.__name__:9s} {dt * 1e3:8.2f} ms  {tflops:6.2f} TFLOP/s  "
          f"max rel err {err:.2e}")
  return results


if __name__ == "__main__":
  main()
