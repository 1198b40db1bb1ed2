"""Vectorized beta-VAE / FactorVAE scoring kernels vs the loop baseline.

VERDICT r3 missing #2 / SURVEY §7 step 6: the 10k-sample Python loops of
the reference (``odin/bay/vi/downstream_metrics.py:305-398``) become one
pre-drawn-index pass + chunked vectorized gathers.  These tests hold the
vectorized estimators equal to the loop implementation within sampling
tolerance at matched budgets, and record the measured speedup (the >=10x
claim is re-measured, not assumed — see results/metrics_speedup.json
written by benchmarks/metric_kernels_speed.py for the full-size numbers).
"""
import time

import numpy as np
import pytest

from odin_tpu.bay.vi.downstream_metrics import (
    beta_vae_score, factor_vae_score, _beta_vae_score_loop,
    _factor_vae_score_loop)


def _synthetic(n=4096, n_factors=4, n_latents=8, noise=0.1, seed=0):
  """Factors with known latent alignment: latent j = factor j + noise,
  remaining latents pure noise -> both metrics should score high."""
  rng = np.random.RandomState(seed)
  cards = [3, 6, 8, 10][:n_factors]
  factors = np.stack([rng.randint(c, size=n) for c in cards], axis=1)
  X = rng.randn(n, n_latents).astype(np.float32) * noise
  for j in range(n_factors):
    X[:, j] += factors[:, j] / cards[j]
  return X, factors


def test_beta_vae_score_matches_loop():
  X, F = _synthetic()
  fast = beta_vae_score(X, F, n_samples=2000, seed=1)
  slow = _beta_vae_score_loop(X, F, n_samples=2000, seed=1)
  # same estimator, independent index draws: sampling tolerance
  assert abs(fast - slow) < 0.05, (fast, slow)
  assert fast > 0.9  # aligned synthetic factors are nearly separable


def test_factor_vae_score_matches_loop():
  X, F = _synthetic()
  fast = factor_vae_score(X, F, n_samples=2000, batch_size=64, seed=1)
  slow = _factor_vae_score_loop(X, F, n_samples=2000, batch_size=64, seed=1)
  assert abs(fast - slow) < 0.05, (fast, slow)
  assert fast > 0.9


def test_beta_vae_score_mcmc_distribution_input():
  """Distribution input: one random MCMC layer per gather (reference
  :311-319) must run and stay in the same score band as the mean path."""
  import jax.numpy as jnp
  X, F = _synthetic()

  class FakeDist:
    def mean(self):
      return jnp.asarray(X)
    def sample(self, key, shape):
      import jax
      return jnp.asarray(X)[None] + 0.01 * jax.random.normal(
          key, shape + X.shape)

  s = beta_vae_score(FakeDist(), F, n_mcmc=3, n_samples=1000, seed=1)
  assert s > 0.85
  s2 = factor_vae_score(FakeDist(), F, n_mcmc=3, n_samples=1000,
                        batch_size=64, seed=1)
  assert s2 > 0.85


def test_degenerate_factor_skipped():
  """A constant factor column has no >=2-sample value pairs... it has ONE
  value holding every sample: still eligible.  A factor whose every value
  appears once is the skip case."""
  rng = np.random.RandomState(0)
  X = rng.randn(256, 4).astype(np.float32)
  F = np.stack([np.arange(256), rng.randint(3, size=256)], axis=1)
  # factor 0: all unique values -> every draw of it is dropped, but the
  # metric still runs on factor 1
  s = beta_vae_score(X, F, n_samples=500, seed=0)
  assert 0.0 <= s <= 1.0
  s2 = factor_vae_score(X, F, n_samples=500, batch_size=32, seed=0)
  assert 0.0 <= s2 <= 1.0


def test_protocol_mean_vs_mcmc_sampling():
  """The round-4 protocol finding: the SAME representation scores materially
  lower under the reference's MCMC-sample/batch-10 evaluation than under
  disentanglement_lib's mean/batch-64 protocol (the published one) when the
  posterior is noisy — the mechanism behind the full-grid gap analysis
  (results/fullgrid/eval_dlib_protocol.py)."""
  import jax
  import jax.numpy as jnp
  X, F = _synthetic(noise=0.02)

  class NoisyPosterior:
    def mean(self):
      return jnp.asarray(X)
    def sample(self, key, shape):
      # posterior std comparable to the factor signal: sampled z is noisy
      return jnp.asarray(X)[None] + 0.5 * jax.random.normal(
          key, shape + X.shape)

  dlib = beta_vae_score(NoisyPosterior(), F, n_mcmc=0, batch_size=64,
                        n_samples=1500, seed=1)
  ref = beta_vae_score(NoisyPosterior(), F, n_mcmc=10, batch_size=10,
                       n_samples=1500, seed=1)
  assert dlib > 0.95, dlib
  assert dlib - ref > 0.05, (dlib, ref)


def test_factor_vae_prune_threshold_std_semantics():
  """prune_threshold >= 1e-3 is a STD threshold (disentanglement_lib's
  `_prune_dims(0.05)`): a dim informative for factor 0 but with global std
  0.01 is kept by the reference default (variance > 1e-6) and pruned by the
  dlib protocol, costing factor-0 votes."""
  rng = np.random.RandomState(3)
  n = 4096
  cards = [8, 8, 8]
  F = np.stack([rng.randint(c, size=n) for c in cards], axis=1)
  X = rng.randn(n, 4).astype(np.float32) * 0.001
  X[:, 0] += 0.01 * (F[:, 0] / 8.0)  # informative, std ~0.01 < 0.05
  X[:, 1] += F[:, 1] / 8.0
  X[:, 2] += F[:, 2] / 8.0
  kept = factor_vae_score(X, F, n_samples=1500, batch_size=64, seed=1)
  pruned = factor_vae_score(X, F, n_samples=1500, batch_size=64, seed=1,
                            prune_threshold=0.05)
  assert kept > 0.9, kept          # all three factors resolved
  assert pruned < kept - 0.15, (kept, pruned)  # factor-0 votes lost


def test_vectorized_speedup():
  """The redesign must beat the loop by >=10x at the reference's own
  10k-sample budget (VERDICT r3 'done' bar)."""
  X, F = _synthetic(n=8192)
  # warm both paths on a tiny budget (sklearn import, BLAS init)
  beta_vae_score(X, F, n_samples=50, seed=1)
  _beta_vae_score_loop(X, F, n_samples=50, seed=1)
  t0 = time.perf_counter()
  beta_vae_score(X, F, n_samples=10000, seed=1)
  fast_t = time.perf_counter() - t0
  t0 = time.perf_counter()
  _beta_vae_score_loop(X, F, n_samples=2000, seed=1)
  slow_t = (time.perf_counter() - t0) * 5  # scale the 1/5 budget
  assert slow_t / fast_t > 10, (slow_t, fast_t)
