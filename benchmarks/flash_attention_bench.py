"""Pallas flash attention vs naive XLA attention on the current backend.

The naive path materializes the (T, T) score matrix in HBM (the
reference's einsum-attention design,
``odin/networks/attention_mechanism.py:92``); the Pallas kernel
(`odin_tpu/ops/pallas_attention.py`) streams K/V tiles through VMEM with an
online softmax, so HBM traffic drops from O(T^2) to O(T*d).  This records
wall-clock per step and the crossover where the fused kernel wins.

Run: ``python benchmarks/flash_attention_bench.py`` (remote TPU: budget
~2-4 min, one compile per (path, T) point).
"""
import json
import time

import numpy as np


def main(batch: int = 4, heads: int = 8, dim: int = 64, iters: int = 20):
  import jax
  import jax.numpy as jnp

  from odin_tpu.ops.pallas_attention import (_reference_attention,
                                             flash_attention)

  naive = jax.jit(lambda q, k, v: _reference_attention(
      q, k, v, dim ** -0.5, False))
  flash = jax.jit(lambda q, k, v: flash_attention(q, k, v))

  rng = np.random.RandomState(0)
  report = {}
  for T in (512, 1024, 2048, 4096):
    q, k, v = (jnp.asarray(rng.randn(batch, heads, T, dim).astype("f"))
               for _ in range(3))
    row = {}
    for name, fn in (("naive", naive), ("flash", flash)):
      out = fn(q, k, v)
      jax.block_until_ready(out)  # compile
      t0 = time.time()
      for _ in range(iters):
        out = fn(q, k, v)
      jax.block_until_ready(out)
      ms = (time.time() - t0) / iters * 1e3
      row[name] = round(ms, 3)
    row["speedup"] = round(row["naive"] / row["flash"], 2)
    err = float(jnp.max(jnp.abs(naive(q, k, v) - flash(q, k, v))))
    row["max_abs_err"] = err
    report[f"T={T}"] = row
    print(f"T={T}: naive {row['naive']:.2f} ms, flash {row['flash']:.2f} ms,"
          f" speedup {row['speedup']}x, err {err:.2e}", flush=True)
  print(json.dumps(report))
  return report


if __name__ == "__main__":
  main()
