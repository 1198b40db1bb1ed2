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


def test_self_supervised_family():
  """GroupVAE/ML-VAE/Ada-GVAE/weak supervision on paired observations
  (reference stubs implemented for real, self_supervised_vae.py)."""
  from odin_tpu.bay.random_variable import RVconf
  from odin_tpu.bay.vi import (AdaptiveVAE, GroupVAE, MultiLevelVAE,
                               WeaklySupervisedVAE)
  from odin_tpu.bay.vi.autoencoder.self_supervised_vae import (
      _aggregate, _sym_kl_per_dim)

  # registry
  for n in ("groupvae", "multilevelvae", "adaptivevae",
            "weaklysupervisedvae"):
    assert get_vae(n) is not None

  # aggregation math
  m1, s1 = jnp.zeros((2, 3)), jnp.ones((2, 3))
  m2, s2 = jnp.ones((2, 3)) * 2.0, jnp.ones((2, 3))
  mg, sg = _aggregate(m1, s1, m2, s2, "group")
  np.testing.assert_allclose(np.asarray(mg), 1.0)
  np.testing.assert_allclose(np.asarray(sg), 1.0)
  mp, sp = _aggregate(m1, s1, m2, s2, "multilevel")
  np.testing.assert_allclose(np.asarray(mp), 1.0)       # equal precisions
  np.testing.assert_allclose(np.asarray(sp), np.sqrt(0.5))
  # identical posteriors -> zero symmetric KL
  np.testing.assert_allclose(np.asarray(_sym_kl_per_dim(m1, s1, m1, s1)), 0.0,
                             atol=1e-6)

  def make(cls, **kw):
    return cls(latents=RVconf(6, "mvndiag", projection=True, name="latents"),
               observation=RVconf((12,), "gaussian", projection=True,
                                  name="observation"),
               input_shape=(12,), **kw).build(seed=0)

  key = jax.random.PRNGKey(0)
  rng = np.random.RandomState(1)
  W = rng.randn(3, 12).astype("f")
  c = rng.randn(16, 3).astype("f")
  x1 = (c + 0.1 * rng.randn(16, 3).astype("f")) @ W
  x2 = (c + 0.1 * rng.randn(16, 3).astype("f")) @ W

  for cls, kw in [(GroupVAE, dict(n_shared=3)), (MultiLevelVAE, {}),
                  (AdaptiveVAE, dict(base_method="multilevel")),
                  (WeaklySupervisedVAE, dict(strategy="match", n_changed=2))]:
    vae = make(cls, **kw)
    llk, kl, aux = vae.elbo_components(vae.state.params, (x1, x2), key, 0,
                                       training=True)
    assert llk["llk_observation"].shape == (16,)
    assert np.all(np.isfinite(np.asarray(llk["llk_observation"])))
    assert np.all(np.isfinite(np.asarray(kl["kl_latents"])))
    # (B, 2, ...) stacked-pair form gives the same structure
    llk_b, _, _ = vae.elbo_components(
        vae.state.params, np.stack([x1, x2], 1), key, 0, training=True)
    np.testing.assert_allclose(np.asarray(llk_b["llk_observation"]),
                               np.asarray(llk["llk_observation"]), rtol=1e-5)
    # unpaired fallback keeps evaluation paths alive
    llk_u, _, _ = vae.elbo_components(vae.state.params, x1, key, 0)
    assert llk_u["llk_observation"].shape == (16,)

  # adaptive mask: identical pair members -> all-but-argmax dims shared
  ada = make(AdaptiveVAE)
  _, _, aux = ada.elbo_components(ada.state.params, (x1, x1 + 1e-4), key, 0)
  # shared-dim count is reported as a metric
  assert float(aux["n_shared"]) >= 0

  # weak supervision: rank strategy adds a pair_loss term driven by y
  wvae = make(WeaklySupervisedVAE, strategy="rank")
  y = (rng.rand(16) > 0.5).astype("f")
  _, kl_r, _ = wvae.elbo_components(wvae.state.params, (x1, x2, y), key, 0,
                                    training=True)
  assert "pair_loss" in kl_r and np.all(np.isfinite(np.asarray(
      kl_r["pair_loss"])))
  # restricted strategy ties posterior means to observed factors
  rvae = make(WeaklySupervisedVAE, strategy="restricted")
  yf = rng.randn(16, 3).astype("f")
  _, kl_f, _ = rvae.elbo_components(rvae.state.params, (x1, x2, yf), key, 0,
                                    training=True)
  assert "pair_loss" in kl_f

  # short fit on pairs: loss must drop
  gv = make(GroupVAE, n_shared=3)
  step = jax.jit(gv.make_step_fn(learning_rate=1e-3, jit=False))
  state = gv.state
  losses = []
  for i in range(40):
    i1 = rng.randint(0, 16, 16)
    state, m = step(state, (x1[i1], x2[i1]))
    losses.append(float(m["loss"]))
  assert losses[-1] < losses[0]
