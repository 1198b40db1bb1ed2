"""Measured speedup of the vectorized beta-VAE / FactorVAE scoring kernels.

VERDICT r3 missing #2 'done' bar: >=10x measured speedup at the reference's
own 10k-sample budget (``odin/bay/vi/downstream_metrics.py:305-398`` is the
loop to beat).  Sizes mirror the full-grid gym protocol: 10,000 held-out
representations x 10 latents x 5 dSprites factors.

Writes results/metrics_speedup.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from odin_tpu.bay.vi.downstream_metrics import (
    beta_vae_score, factor_vae_score, _beta_vae_score_loop,
    _factor_vae_score_loop)


def main():
  rng = np.random.RandomState(0)
  cards = [3, 6, 40, 32, 32]
  n = 10000
  factors = np.stack([rng.randint(c, size=n) for c in cards], axis=1)
  X = rng.randn(n, 10).astype(np.float32) * 0.1
  for j in range(5):
    X[:, min(j * 2, 9)] += factors[:, j] / cards[j]

  def _factor_vae_reference_loop(X, factors, batch_size=256, n_samples=2000,
                                 seed=1):
    """Faithful re-type of the reference's `_sampling_helper` 'factorvae'
    branch (``downstream_metrics.py:305-398``): defaultdict(list) buckets,
    so every iteration's ``rand.choice(list)`` re-converts the whole
    bucket — THE hot loop VERDICT r3 names as the one to beat."""
    from collections import defaultdict
    rand = np.random.RandomState(seed)
    n_factors = factors.shape[1]
    size = len(X)
    factor2ids = defaultdict(list)
    for idx, y in enumerate(factors.T):
      for sample_idx, i in enumerate(y):
        factor2ids[(idx, int(i))].append(sample_idx)
    global_var = np.var(X, axis=0, ddof=1)
    active = global_var > 1e-6
    n_latents = X.shape[1]
    votes = np.zeros((n_factors, n_latents), np.int64)
    count = 0
    while count < n_samples:
      f = rand.randint(n_factors)
      y = factors[rand.randint(size, dtype=np.int64), f]
      obs_ids = factor2ids[(f, int(y))]
      if len(obs_ids) > 1:
        obs = X[rand.choice(obs_ids, size=batch_size, replace=True)]
        local_var = np.var(obs, axis=0, ddof=1)
        j = int(np.argmin(local_var[active] / global_var[active]))
        votes[f, j] += 1
        count += 1
    return votes

  out = {}
  for name, fast, slow, kw in (
      ("beta_vae_score", beta_vae_score, _beta_vae_score_loop,
       dict(batch_size=10)),
      ("factor_vae_score", factor_vae_score, _factor_vae_score_loop,
       dict(batch_size=256))):
    fast(X, factors, n_samples=100, seed=1, **kw)  # warm
    t0 = time.perf_counter()
    s_fast = fast(X, factors, n_samples=10000, seed=1, **kw)
    t_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    s_slow = slow(X, factors, n_samples=2000, seed=1, **kw)
    t_slow = (time.perf_counter() - t0) * 5.0  # scaled from 1/5 budget
    out[name] = dict(score_vectorized=round(s_fast, 4),
                     score_loop=round(s_slow, 4),
                     sec_vectorized=round(t_fast, 3),
                     sec_loop_scaled=round(t_slow, 3),
                     speedup=round(t_slow / t_fast, 1))
    print(f"{name}: {t_slow:.2f}s loop -> {t_fast:.2f}s vectorized "
          f"({t_slow / t_fast:.1f}x), scores {s_slow:.3f} vs {s_fast:.3f}")

  # the reference-faithful list-bucket loop (the design VERDICT r3 cites)
  _factor_vae_reference_loop(X, factors, n_samples=50)
  t0 = time.perf_counter()
  _factor_vae_reference_loop(X, factors, n_samples=2000)
  t_ref = (time.perf_counter() - t0) * 5.0
  out["factor_vae_score"]["sec_reference_loop_scaled"] = round(t_ref, 3)
  out["factor_vae_score"]["speedup_vs_reference_loop"] = round(
      t_ref / out["factor_vae_score"]["sec_vectorized"], 1)
  print(f"factor_vae_score vs reference list-bucket loop: {t_ref:.2f}s -> "
        f"{out['factor_vae_score']['sec_vectorized']:.2f}s "
        f"({out['factor_vae_score']['speedup_vs_reference_loop']:.1f}x)")

  # full-grid scale: the reference loop is O(bucket size) per iteration
  # (list -> array conversion inside rand.choice), the vectorized path is
  # O(batch); at the 737k-image dSprites grid buckets hold ~184k-245k ids
  ng = 73728  # 10% grid here to keep the benchmark quick; scaling is linear
  factors_g = np.stack([rng.randint(c, size=ng) for c in cards], axis=1)
  Xg = rng.randn(ng, 10).astype(np.float32)
  factor_vae_score(Xg, factors_g, n_samples=100, seed=1)
  t0 = time.perf_counter()
  factor_vae_score(Xg, factors_g, n_samples=10000, seed=1)
  t_fast_g = time.perf_counter() - t0
  _factor_vae_reference_loop(Xg, factors_g, n_samples=20)
  t0 = time.perf_counter()
  _factor_vae_reference_loop(Xg, factors_g, n_samples=500)
  t_ref_g = (time.perf_counter() - t0) * 20.0
  out["factor_vae_score_73k_corpus"] = dict(
      sec_vectorized=round(t_fast_g, 3),
      sec_reference_loop_scaled=round(t_ref_g, 3),
      speedup=round(t_ref_g / t_fast_g, 1))
  print(f"factor_vae_score @73k corpus: reference loop {t_ref_g:.1f}s -> "
        f"{t_fast_g:.2f}s vectorized ({t_ref_g / t_fast_g:.0f}x)")

  path = os.path.join(os.path.dirname(__file__), "..", "results",
                      "metrics_speedup.json")
  with open(path, "w") as f:
    json.dump(out, f, indent=2)
  print("wrote", os.path.abspath(path))


if __name__ == "__main__":
  main()
