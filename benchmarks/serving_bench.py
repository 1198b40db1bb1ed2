"""Serving-path latency/throughput on the real TPU.

Measures the exported StableHLO bundle (`odin_tpu.serving.export_vae`) —
the model-code-free production inference surface — for the flagship
dSprites conv VAE:

  * `encode_mean` and `reconstruct` round-trip latency at batch 1 (the
    interactive serving point: host -> device -> compute -> host), and
  * `reconstruct` throughput at batch 256 (the bulk-scoring point,
    images/s end-to-end including transfers),
  * fp32 weights-captured bundle vs the int8 weight-only quantized one
    (4x smaller artifact; weights passed as runtime args).

The exported artifacts are batch-polymorphic, so ONE artifact serves both
batch sizes — each concrete batch size still costs one XLA compile at
load time (cached thereafter).

No reference counterpart (the reference has no serving layer, SURVEY §1).
Run:  python benchmarks/serving_bench.py
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from odin_tpu.bay.vi import BetaVAE
from odin_tpu.networks import get_networks
from odin_tpu.serving import ServingBundle, export_vae

ROUNDS = 50


def bench_fn(fn, x, rounds=ROUNDS):
  # one distinct input per round: the axon backend memoizes dispatches on
  # bit-identical args (CLAUDE.md) — vary the content so every round does
  # real compute, not a memo lookup
  rs = np.random.RandomState(7)
  xs = [np.where(rs.rand(*x.shape) < 1.0 / x.size, 1.0 - x, x).astype(x.dtype)
        for _ in range(rounds)]
  out = jax.block_until_ready(fn(jnp.asarray(x)))  # compile
  t0 = time.time()
  for xi in xs:
    out = fn(jnp.asarray(xi))  # includes host->device transfer
  jax.block_until_ready(out)
  return (time.time() - t0) / rounds


def main():
  vae = BetaVAE(beta=1.0, **get_networks("dsprites", zdim=10)).build(seed=1)
  x1 = (np.random.RandomState(0).rand(1, 64, 64, 1) < 0.5).astype("f")
  x256 = (np.random.RandomState(1).rand(256, 64, 64, 1) < 0.5).astype("f")

  results = {}
  for tag, quantize in (("fp32", False), ("int8", True)):
    with tempfile.TemporaryDirectory() as d:
      export_vae(vae, d, quantize=quantize)
      bundle = ServingBundle(d)
      size_mb = sum(m["bytes"] for m in bundle.manifest.values()) / 1e6
      enc = bundle["encode_mean"]
      rec = bundle["reconstruct"]
      lat_e = bench_fn(enc, x1)
      lat_r = bench_fn(rec, x1)
      thr = x256.shape[0] / bench_fn(rec, x256)
      results[tag] = dict(bundle_mb=round(size_mb, 2),
                          encode_b1_ms=round(lat_e * 1e3, 3),
                          reconstruct_b1_ms=round(lat_r * 1e3, 3),
                          reconstruct_b256_images_per_s=round(thr, 1))
      print(tag, json.dumps(results[tag]), flush=True)

  # sanity: quantized reconstruction stays close to fp32
  with tempfile.TemporaryDirectory() as d1, \
       tempfile.TemporaryDirectory() as d2:
    export_vae(vae, d1, quantize=False)
    export_vae(vae, d2, quantize=True)
    r1 = np.asarray(ServingBundle(d1)["reconstruct"](jnp.asarray(x1)))
    r2 = np.asarray(ServingBundle(d2)["reconstruct"](jnp.asarray(x1)))
    results["int8_max_recon_delta"] = float(np.max(np.abs(r1 - r2)))
  print(json.dumps(results))


if __name__ == "__main__":
  main()
