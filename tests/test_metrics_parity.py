"""Numeric parity of the disentanglement metric kernels vs the EXECUTED
reference implementations (`odin/bay/vi/downstream_metrics.py`,
`odin/bay/vi/metrics.py`, loaded standalone by tests/ref_metrics_loader.py).

Both sides are numpy+sklearn, so with identical hyperparameters and seeds
the scores must agree to float tolerance:

- MIG / discrete MI / discrete entropy: identical algorithms, ~exact.
- SAP (discrete + continuous): the reference recipe is
  StandardScaler -> LinearSVC(C=0.01, balanced, max_iter), same split seed.
- DCI: ours called with the reference's effective sklearn GBT config
  (``ml/tree.py:23-76`` after kwarg filtering: learning_rate=1.0,
  n_estimators=100, subsample=0.8, max_depth=None) must reproduce the
  reference's (d, c, i) on the same data/seed.
"""
import numpy as np
import pytest

from odin_tpu.bay.vi import downstream_metrics as ours_dm
from odin_tpu.bay.vi import metrics as ours_m

from tests.ref_metrics_loader import load_reference_metrics

REF_DM, REF_M = load_reference_metrics()

RNG = np.random.RandomState(42)
N, L, K = 400, 6, 3
# factors with 3-4 discrete values; latents correlated with factors + noise
FACTORS = np.stack([RNG.randint(0, c, N) for c in (3, 4, 3)], axis=1)
MIX = RNG.rand(K, L) * (RNG.rand(K, L) > 0.5)
CODES = FACTORS.astype("f") @ MIX + 0.3 * RNG.randn(N, L).astype("f")
DISCRETE_CODES = np.stack(
    [np.digitize(CODES[:, i], np.quantile(CODES[:, i], [0.25, 0.5, 0.75]))
     for i in range(L)], axis=1)


def test_mig_and_discrete_mi_match_reference():
  np.testing.assert_allclose(
      ours_m.discrete_mutual_info(DISCRETE_CODES, FACTORS),
      REF_M.discrete_mutual_info(DISCRETE_CODES, FACTORS), rtol=1e-10)
  np.testing.assert_allclose(
      ours_m.discrete_entropy(FACTORS), REF_M.discrete_entropy(FACTORS),
      rtol=1e-10)
  np.testing.assert_allclose(
      ours_m.mutual_info_gap(DISCRETE_CODES, FACTORS),
      REF_M.mutual_info_gap(DISCRETE_CODES, FACTORS), rtol=1e-10)


def test_sap_matches_reference():
  ours = ours_dm.separated_attr_predictability(CODES, FACTORS, seed=1)
  ref = REF_DM.separated_attr_predictability(CODES, FACTORS, seed=1)
  np.testing.assert_allclose(ours, ref, rtol=1e-8)
  # continuous-factor branch (pure covariance formula)
  fc = FACTORS + 0.01 * RNG.randn(*FACTORS.shape)
  ours_c = ours_dm.separated_attr_predictability(
      CODES, fc, continuous_factors=True, seed=1)
  ref_c = REF_DM.separated_attr_predictability(
      CODES, fc, continuous_factors=True, seed=1)
  np.testing.assert_allclose(ours_c, ref_c, rtol=1e-8)


def test_dci_matches_reference_at_reference_config():
  ref = REF_DM.dci_scores(CODES, FACTORS, seed=1)
  ours = ours_dm.dci_scores(CODES, FACTORS, seed=1, learning_rate=1.0,
                            n_estimators=100, subsample=0.8, max_depth=None)
  # identical GBT importances; D/C formulas differ only in epsilon placement
  np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_importance_matrix_matches_reference_at_reference_config():
  ref_imp, ref_tr, ref_te = REF_DM.importance_matrix(CODES, FACTORS, seed=1)
  imp, tr, te = ours_dm.importance_matrix(
      CODES, FACTORS, seed=1, learning_rate=1.0, n_estimators=100,
      subsample=0.8, max_depth=None)
  np.testing.assert_allclose(imp, ref_imp, rtol=1e-10)
  np.testing.assert_allclose(tr, ref_tr, rtol=1e-10)
  np.testing.assert_allclose(te, ref_te, rtol=1e-10)
