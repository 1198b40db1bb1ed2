"""Unrolled python loop vs `lax.scan` for K optimizer steps in one jit.

TPU analogue of the reference's ``benchmarks/unroll_vs_scan.py``: on XLA
the unrolled program body grows O(K) (compile time explodes, slightly
better steady-state scheduling), while scan compiles one body and loops —
this is why `training.core.scan_steps` uses scan.

Run: ``python benchmarks/unroll_vs_scan.py`` (CPU by default; set
JAX_PLATFORMS to target the TPU).
"""
import time

import numpy as np


def main(K: int = 20, dim: int = 256, batch: int = 64):
  import jax
  import jax.numpy as jnp
  import optax

  def loss_fn(w, x):
    h = jnp.tanh(x @ w)
    return jnp.mean((h @ w.T - x) ** 2)

  opt = optax.adam(1e-3)
  rng = np.random.RandomState(0)
  w0 = jnp.asarray(rng.randn(dim, dim).astype("f") * 0.05)
  xs = jnp.asarray(rng.randn(K, batch, dim).astype("f"))

  def step(carry, x):
    w, s = carry
    g = jax.grad(loss_fn)(w, x)
    u, s = opt.update(g, s, w)
    return (optax.apply_updates(w, u), s), loss_fn(w, x)

  def run_scan(w, s, xs):
    (w, s), losses = jax.lax.scan(step, (w, s), xs)
    return w, losses[-1]

  def run_unrolled(w, s, xs):
    loss = 0.0
    for k in range(K):
      (w, s), loss = step((w, s), xs[k])
    return w, loss

  results = {}
  for name, fn in [("scan", run_scan), ("unrolled", run_unrolled)]:
    f = jax.jit(fn)
    t0 = time.time()
    w, loss = f(w0, opt.init(w0), xs)
    jax.block_until_ready(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(5):
      w, loss = f(w0, opt.init(w0), xs)
    jax.block_until_ready(loss)
    run_s = (time.time() - t0) / 5
    results[name] = (compile_s, run_s)
    print(f"{name:9s} compile {compile_s:7.3f}s   steady-state "
          f"{run_s * 1e3:8.2f} ms / {K} steps")
  return results


if __name__ == "__main__":
  main()
