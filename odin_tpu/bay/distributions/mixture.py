"""Mixture distributions (reference: ``odin/bay/distributions/mixture.py``).

`MixtureSameFamily` covers the reference aliases 'gmm'/'mdn' (mixture density
networks, ``odin/bay/layers/mixture_layers.py:56``) and the NB mixtures
('mixnb'/'mixzinb').
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from odin_tpu.bay.distributions.base import Distribution
from odin_tpu.bay.distributions.discrete import Categorical

__all__ = ["MixtureSameFamily", "GaussianMixture"]


class MixtureSameFamily(Distribution):
  """Mixture over the last batch axis of `components_distribution`.

  `mixture_distribution`: Categorical with K logits.
  `components_distribution`: batch_shape = (..., K), any event_shape.
  """

  _params = ("mixture_distribution", "components_distribution")

  def __init__(self, mixture_distribution: Categorical,
               components_distribution: Distribution):
    self.mixture_distribution = mixture_distribution
    self.components_distribution = components_distribution

  @property
  def batch_shape(self):
    return self.components_distribution.batch_shape[:-1]

  @property
  def event_shape(self):
    return self.components_distribution.event_shape

  @property
  def num_components(self):
    return self.components_distribution.batch_shape[-1]

  def _pad_mix(self, logp_mix):
    e = len(self.event_shape)
    return logp_mix.reshape(logp_mix.shape + (1,) * e) if e else logp_mix

  def sample(self, seed, sample_shape=()):
    k1, k2 = jax.random.split(seed)
    comps = self.components_distribution.sample(k1, sample_shape)
    # comps: sample_shape + batch_shape + (K,) + event_shape
    idx = self.mixture_distribution.sample(k2, sample_shape)  # sample+batch
    e = len(self.event_shape)
    K_axis = comps.ndim - e - 1
    onehot = jax.nn.one_hot(idx, self.num_components, dtype=comps.dtype)
    onehot = onehot.reshape(onehot.shape + (1,) * e)
    return jnp.sum(comps * onehot, axis=K_axis)

  def log_prob(self, x):
    e = len(self.event_shape)
    # insert a length-1 axis aligning with the K axis of the components batch
    x_expanded = jnp.expand_dims(x, axis=x.ndim - e)  # (..., 1, *event)
    lp = self.components_distribution.log_prob(x_expanded)  # (..., K)
    logw = jax.nn.log_softmax(self.mixture_distribution.logits, axis=-1)
    return jax.scipy.special.logsumexp(lp + logw, axis=-1)

  def mean(self):
    w = jax.nn.softmax(self.mixture_distribution.logits, axis=-1)
    m = self.components_distribution.mean()
    e = len(self.event_shape)
    w = w.reshape(w.shape + (1,) * e)
    return jnp.sum(w * m, axis=-1 - e)

  def variance(self):
    w = jax.nn.softmax(self.mixture_distribution.logits, axis=-1)
    m = self.components_distribution.mean()
    v = self.components_distribution.variance()
    e = len(self.event_shape)
    w = w.reshape(w.shape + (1,) * e)
    mix_mean = jnp.sum(w * m, axis=-1 - e, keepdims=True)
    return jnp.sum(w * (v + (m - mix_mean) ** 2), axis=-1 - e)


def GaussianMixture(logits, locs, scales, covariance: str = "diag"):
  """Build a mixture of (diagonal) Gaussians; mirrors the reference's
  `GaussianMixture` helper (``odin/bay/distributions/mixture.py:21``)."""
  from odin_tpu.bay.distributions.base import Independent
  from odin_tpu.bay.distributions.continuous import (
      MultivariateNormalDiag, MultivariateNormalTriL, Normal)
  mix = Categorical(logits=logits)
  if covariance in ("none", "scalar"):
    comps = Normal(locs, scales)
  elif covariance == "diag":
    comps = MultivariateNormalDiag(locs, scales)
  elif covariance in ("tril", "full"):
    comps = MultivariateNormalTriL(locs, scales)
  else:
    raise ValueError(f"unknown covariance: {covariance}")
  return MixtureSameFamily(mix, comps)
