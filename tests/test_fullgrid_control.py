"""Full-grid metric-path control: a perfect representation must score ~1.

Round-4 evidence for the benchmark pillar: the full-grid dSprites scores
for BetaVAE(beta=4) came out below the published medians, so this control
pins the *measurement path* — real full-grid factors from the actual test
partition, fed through the same beta/FactorVAE kernels the gym uses, with
the representation set to the ground-truth factors themselves.  A score
materially below 1.0 here would indicate factor/alignment/kernel breakage;
1.0 means low model scores are properties of the learned representation
(single-seed beta-VAE variance, Locatello et al. 2019), not the harness.

Also pins x<->y alignment: re-rendering the returned labels must reproduce
the returned images bit-exactly.
"""
import numpy as np
import pytest

from odin_tpu.bay.vi import downstream_metrics as dm
from odin_tpu.fuel import dSprites


@pytest.mark.slow
def test_fullgrid_perfect_representation_scores_one():
  ds = dSprites(full_grid=True)
  x, y = ds.numpy("test")
  y = np.asarray(y)[:8000].astype(np.int64)
  # alignment: stored grid images == render(labels)
  xr = ds.render(y[:32])
  np.testing.assert_array_equal(ds.normalize255(np.asarray(x[:32])), xr)

  rng = np.random.RandomState(0)
  z = (y.astype("f") / np.asarray(ds.factor_sizes, "f")
       + 0.01 * rng.randn(*y.shape).astype("f"))
  assert dm.beta_vae_score(z, y, n_samples=2000, seed=1) >= 0.99
  assert dm.factor_vae_score(z, y, n_samples=2000, seed=1) >= 0.99
