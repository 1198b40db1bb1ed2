"""VAE zoo: registry completeness, objective semantics, smoke training."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odin_tpu.networks import get_networks
from odin_tpu.bay.vi import get_vae, get_all_vae
from odin_tpu.bay import distributions as D
from odin_tpu.bay.vi.losses import (
    total_correlation, disentangled_inferred_prior_loss,
    maximum_mean_discrepancy)
from odin_tpu.bay.vi.utils import permute_dims, discretizing

RNG = np.random.RandomState(5)
KEY = jax.random.PRNGKey(0)


def test_registry_completeness():
  zoo = get_all_vae()
  names = {c.__name__ for c in zoo}
  expected = {
      "VariationalAutoencoder", "BetaVAE", "Beta10VAE", "BetaGammaVAE",
      "Gamma10VAE", "AnnealingVAE", "BetaTCVAE", "BetaCapacityVAE",
      "FactorVAE", "SemiFactorVAE", "InfoVAE", "MIVAE", "DIPVAE", "irmVAE",
      "irmAE", "HypersphericalVAE", "PowersphericalVAE", "TwoStageVAE",
      "VampriorVAE", "VQVAE", "amortizedLDA", "auxiliaryLDA", "nonlinearLDA",
      "ALDA", "MultitaskVAE", "SkiptaskVAE", "MultiheadVAE", "M2VAE",
      "ConditionalM2VAE", "StructuredSemiVAE", "reparamsM3VAE",
      "auxiliaryVAE", "SemafoVAE", "RemafoVAE", "semafod", "semafoh",
      "semafos", "semafosm", "semafosc", "semafop", "semafot",
      "HierarchicalVAE", "UnetVAE", "PUnetVAE", "VeryDeepVAE",
      "StochasticVAE", "ImputeVAE", "Autoencoder",
  }
  missing = expected - names
  assert not missing, f"missing zoo models: {missing}"
  assert len(zoo) >= 45


def test_permute_dims_is_columnwise_permutation():
  z = jnp.asarray(RNG.randn(32, 6).astype("f"))
  zp = permute_dims(z, KEY)
  assert zp.shape == z.shape
  # every column keeps the same multiset of values
  for j in range(6):
    np.testing.assert_allclose(np.sort(np.asarray(z[:, j])),
                               np.sort(np.asarray(zp[:, j])), rtol=1e-6)
  # but the matrix as a whole is shuffled
  assert not np.allclose(np.asarray(z), np.asarray(zp))


def test_total_correlation_sign():
  # independent gaussian -> TC near 0; duplicated dims -> TC positive
  n = 512
  z_ind = RNG.randn(n, 4).astype("f")
  q_ind = D.MultivariateNormalDiag(jnp.asarray(z_ind),
                                   jnp.ones((n, 4), jnp.float32) * 0.5)
  tc_ind = float(total_correlation(jnp.asarray(z_ind), q_ind))
  base = RNG.randn(n, 1).astype("f")
  z_dup = np.concatenate([base] * 4, -1) + 0.01 * RNG.randn(n, 4).astype("f")
  q_dup = D.MultivariateNormalDiag(jnp.asarray(z_dup),
                                   jnp.ones((n, 4), jnp.float32) * 0.5)
  tc_dup = float(total_correlation(jnp.asarray(z_dup), q_dup))
  assert tc_dup > tc_ind + 1.0


def test_dip_loss_identity_covariance():
  # posterior means with identity covariance and unit variance -> small loss
  n = 4096
  z = RNG.randn(n, 3).astype("f")
  z = (z - z.mean(0)) / z.std(0)
  q_good = D.MultivariateNormalDiag(jnp.asarray(z), jnp.full((n, 3), 1e-3))
  good = float(disentangled_inferred_prior_loss(q_good))
  q_bad = D.MultivariateNormalDiag(jnp.asarray(z * 3.0), jnp.full((n, 3), 1e-3))
  bad = float(disentangled_inferred_prior_loss(q_bad))
  assert good < bad


def test_mmd_zero_for_same_distribution():
  p = D.MultivariateNormalDiag(jnp.zeros(4), jnp.ones(4))
  q = D.MultivariateNormalDiag(jnp.zeros(4), jnp.ones(4))
  mmd_same = float(maximum_mean_discrepancy(q, p, seed=KEY,
                                            q_sample_shape=200,
                                            p_sample_shape=200))
  q2 = D.MultivariateNormalDiag(jnp.full(4, 3.0), jnp.ones(4))
  mmd_diff = float(maximum_mean_discrepancy(q2, p, seed=KEY,
                                            q_sample_shape=200,
                                            p_sample_shape=200))
  assert abs(mmd_same) < 0.05
  assert mmd_diff > 0.2


def test_discretizing():
  f = RNG.rand(200, 2).astype("f")
  out = discretizing(f, n_bins=5, strategy="uniform")
  assert out.shape == f.shape
  assert set(np.unique(out)) <= set(range(5))


@pytest.mark.parametrize("name", ["betavae", "factorvae", "betatcvae",
                                  "hierarchicalvae", "m2vae", "vqvae"])
def test_smoke_training(name):
  X = (RNG.rand(64, 28, 28, 1) < 0.3).astype("float32")
  Y = np.eye(10, dtype="f")[RNG.randint(0, 10, 64)]
  M = np.ones(64, "f")
  semi = name == "m2vae"
  nets = get_networks("mnist", zdim=8, is_semi_supervised=semi,
                      is_hierarchical=name == "hierarchicalvae")
  vae = get_vae(name)(**nets).build()

  def it(n, bs=16):
    for _ in range(n):
      i = RNG.randint(0, 64, bs)
      yield (X[i], Y[i], M[i]) if semi else X[i]

  tr = vae.fit(it(4), max_iter=4, logging_interval=1e9, verbose=False)
  assert len(tr.history) >= 1
  for k, v in tr.history[-1].items():
    if isinstance(v, float):
      assert np.isfinite(v), (k, v)


def test_beta_scaling_changes_kl_weight():
  from odin_tpu.bay.vi import BetaVAE
  nets = get_networks("halfmoons", zdim=2)
  X = RNG.randn(32, 2).astype("f")
  v1 = BetaVAE(beta=1.0, **nets).build(seed=3)
  v2 = BetaVAE(beta=10.0, **nets).build(seed=3)
  llk1, kl1, _ = v1.elbo_components(v1.state.params, X, KEY, 0)
  llk2, kl2, _ = v2.elbo_components(v2.state.params, X, KEY, 0)
  np.testing.assert_allclose(np.asarray(kl1["kl_latents"]) * 10.0,
                             np.asarray(kl2["kl_latents"]), rtol=1e-4)
