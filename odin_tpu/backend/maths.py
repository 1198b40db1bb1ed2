"""Math utilities (reference: ``odin/backend/maths.py:17-694``).

Only the ops not already provided by jnn/jnp are kept: length-normalization,
whitening, softplus inverse, stable log variants.  They accept jnp or NumPy
arrays and stay pure/traceable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["softplus_inverse", "length_norm", "log_norm", "whitening", "logsumexp_mean"]


def softplus_inverse(x):
  """Inverse of softplus: log(exp(x) - 1), numerically stable.

  Reference: ``odin/backend/maths.py`` (`softplus_inverse`).
  """
  x = jnp.asarray(x)
  return x + jnp.log(-jnp.expm1(-x))


def length_norm(x, axis: int = -1, epsilon: float = 1e-12, ord: int = 2):
  """Unit-length normalization along `axis` (i-vector post-processing;
  reference ``odin/backend/maths.py`` `length_norm`)."""
  x = jnp.asarray(x)
  if ord == 2:
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), epsilon))
  else:
    norm = jnp.maximum(jnp.sum(jnp.abs(x) ** ord, axis=axis, keepdims=True) ** (1.0 / ord), epsilon)
  return x / norm


def log_norm(x, axis: int = 1, scale_factor: float = 10000.0):
  """log(1 + x / sum(x) * scale) normalization used for count data."""
  x = jnp.asarray(x, jnp.float32)
  s = jnp.sum(x, axis=axis, keepdims=True)
  return jnp.log1p(x / jnp.maximum(s, 1e-8) * scale_factor)


def whitening(x, mean=None, cov=None, epsilon: float = 1e-5):
  """ZCA whitening transform of row vectors.

  Reference: ``odin/backend/maths.py`` (`whitening`).
  """
  x = jnp.asarray(x, jnp.float32)
  if mean is None:
    mean = jnp.mean(x, axis=0, keepdims=True)
  xc = x - mean
  if cov is None:
    cov = (xc.T @ xc) / x.shape[0]
  w, v = jnp.linalg.eigh(cov)
  W = v @ jnp.diag(1.0 / jnp.sqrt(w + epsilon)) @ v.T
  return xc @ W


def logsumexp_mean(x, axis: int = 0):
  """log-mean-exp — the importance-weighted average used by IWAE
  (reference ``odin/bay/vi/_base.py:91-122``)."""
  x = jnp.asarray(x)
  n = x.shape[axis]
  return jax.scipy.special.logsumexp(x, axis=axis) - jnp.log(float(n))
