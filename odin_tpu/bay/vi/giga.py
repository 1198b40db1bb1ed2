"""GIGA — information-gain estimators I(z;x) and I(z;y).

Reference: ``odin/bay/vi/giga.py:24,61,140`` (`estimate_Izx`, `estimate_Izy`)
— variational mutual-information estimates between latents and inputs/
factors.  `estimate_Izx` uses the minibatch aggregate-posterior bound
(I(z;x) = E_x[KL(q(z|x)||q(z))], estimated with the mixture-of-posteriors
aggregate); `estimate_Izy` fits a probe and reports the Gibbs information
gain H(y) - H(y|z).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["estimate_Izx", "estimate_Izy"]


def estimate_Izx(qz, z: Optional[jnp.ndarray] = None,
                 seed: Optional[jax.Array] = None) -> float:
  """I(z;x) lower-bound via the minibatch mixture aggregate posterior:
  ``E_i[log q(z_i|x_i) - log (1/N) sum_j q(z_i|x_j)]`` (reference :24)."""
  if z is None:
    assert seed is not None, "provide z samples or a seed"
    z = qz.sample(seed)
  n = z.shape[0]
  # log q(z_i | x_j) matrix via the batch axis broadcast (i, j)
  lp = qz.log_prob(z[:, None, :] if z.ndim == 2 else z[:, None])
  log_qz_agg = jax.scipy.special.logsumexp(lp, axis=1) - jnp.log(float(n))
  log_qz_cond = jnp.diagonal(lp)
  return float(jnp.mean(log_qz_cond - log_qz_agg))


def estimate_Izy(z: np.ndarray, y: np.ndarray, seed: int = 1,
                 test_size: float = 0.3) -> float:
  """I(z;y) >= H(y) - H(y|z) with H(y|z) from a held-out logistic probe
  (reference :61): the Gibbs information gain in nats."""
  from sklearn.linear_model import LogisticRegression
  from sklearn.model_selection import train_test_split
  z = np.asarray(z)
  y = np.asarray(y).ravel()
  classes, counts = np.unique(y, return_counts=True)
  p = counts / counts.sum()
  H_y = -np.sum(p * np.log(p))
  ztr, zte, ytr, yte = train_test_split(z, y, test_size=test_size,
                                        random_state=seed, stratify=y)
  probe = LogisticRegression(max_iter=2000, random_state=seed).fit(ztr, ytr)
  proba = np.clip(probe.predict_proba(zte), 1e-12, 1.0)
  class_to_col = {c: i for i, c in enumerate(probe.classes_)}
  ll = np.log(proba[np.arange(len(yte)), [class_to_col[c] for c in yte]])
  H_y_given_z = -float(np.mean(ll))
  return max(H_y - H_y_given_z, 0.0)
