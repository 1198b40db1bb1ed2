"""Quantized (discretized) logistic likelihoods for pixel data.

Reference: ``odin/bay/distributions/quantized.py:50,206`` (`QuantizedLogistic`,
`MixtureQuantizedLogistic`) — the PixelCNN++ discretized-logistic likelihood.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from odin_tpu.bay.distributions.base import Distribution, _shapes_broadcast
from odin_tpu.bay.distributions.continuous import Logistic
from odin_tpu.bay.distributions.discrete import Categorical
from odin_tpu.bay.distributions.mixture import MixtureSameFamily

__all__ = ["QuantizedLogistic", "MixtureQuantizedLogistic",
           "Quantized", "qNormal", "qUniform"]


class QuantizedLogistic(Distribution):
  """Logistic CDF integrated over integer-width bins in [low, high].

  `inputs_domain` follows the reference: 'sigmoid' means data arrives in
  [0, 1] and is internally rescaled to the integer grid.
  """

  _params = ("loc", "scale")
  _static = ("low", "high", "inputs_domain")

  def __init__(self, loc, scale, low: int = 0, high: int = 255,
               inputs_domain: str = "sigmoid"):
    self.loc = jnp.asarray(loc)
    self.scale = jnp.asarray(scale)
    self.low = int(low)
    self.high = int(high)
    self.inputs_domain = inputs_domain

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.loc), jnp.shape(self.scale))

  def _to_grid(self, x):
    if self.inputs_domain == "sigmoid":
      return x * (self.high - self.low) + self.low
    return x

  def _from_grid(self, x):
    if self.inputs_domain == "sigmoid":
      return (x - self.low) / (self.high - self.low)
    return x

  def sample(self, seed, sample_shape=()):
    base = Logistic(self.loc, self.scale).sample(seed, sample_shape)
    x = jnp.clip(jnp.round(base), self.low, self.high)
    return self._from_grid(x)

  def log_prob(self, x):
    x = self._to_grid(x)
    base = Logistic(self.loc, self.scale)
    plus = base.cdf(x + 0.5)
    minus = base.cdf(x - 0.5)
    mid = jnp.log(jnp.maximum(plus - minus, 1e-12))
    # edge bins integrate the full tails
    log_low = base.log_cdf(x + 0.5)
    log_high = jnp.log(jnp.maximum(1.0 - base.cdf(x - 0.5), 1e-12))
    out = jnp.where(x <= self.low, log_low, jnp.where(x >= self.high, log_high, mid))
    return out

  def mean(self):
    return self._from_grid(jnp.broadcast_to(self.loc, self.batch_shape))

  def mode(self):
    return self.mean()

  def variance(self):
    import math
    return jnp.broadcast_to((self.scale * math.pi) ** 2 / 3.0, self.batch_shape) / \
        ((self.high - self.low) ** 2 if self.inputs_domain == "sigmoid" else 1.0)


def MixtureQuantizedLogistic(logits, locs, scales, low: int = 0, high: int = 255,
                             inputs_domain: str = "sigmoid") -> MixtureSameFamily:
  """K-component mixture of quantized logistics (PixelCNN++ likelihood;
  reference ``odin/bay/distributions/quantized.py:206``)."""
  return MixtureSameFamily(
      Categorical(logits=logits),
      QuantizedLogistic(locs, scales, low=low, high=high,
                        inputs_domain=inputs_domain))


class Quantized(Distribution):
  """Generic integer quantization of a continuous base distribution:
  ``P(X = j) = cdf(j + .5) - cdf(j - .5)``, with the tails folded into the
  optional ``low``/``high`` edge bins (reference TFP `QuantizedDistribution`
  as used by ``quantized.py:459,479``).  The base must expose `cdf`."""

  _params = ("distribution",)
  _static = ("low", "high")

  def __init__(self, distribution: Distribution, low=None, high=None):
    self.distribution = distribution
    self.low = low
    self.high = high

  @property
  def batch_shape(self):
    return self.distribution.batch_shape

  @property
  def event_shape(self):
    return self.distribution.event_shape

  def sample(self, seed, sample_shape=()):
    x = jnp.round(self.distribution.sample(seed, sample_shape))
    if self.low is not None:
      x = jnp.maximum(x, self.low)
    if self.high is not None:
      x = jnp.minimum(x, self.high)
    return x

  def log_prob(self, x):
    base = self.distribution
    plus, minus = base.cdf(x + 0.5), base.cdf(x - 0.5)
    out = jnp.log(jnp.maximum(plus - minus, 1e-12))
    if self.low is not None:
      out = jnp.where(x <= self.low,
                      jnp.log(jnp.maximum(base.cdf(x + 0.5), 1e-12)), out)
    if self.high is not None:
      out = jnp.where(x >= self.high,
                      jnp.log(jnp.maximum(1.0 - base.cdf(x - 0.5), 1e-12)),
                      out)
    return out

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def mean(self):
    return self.distribution.mean()

  def mode(self):
    return jnp.round(self.distribution.mode())


class qNormal(Quantized):
  """Quantized Normal (reference ``quantized.py:459``)."""

  def __init__(self, loc=0.0, scale=1.0, min_value=None, max_value=None):
    from odin_tpu.bay.distributions.continuous import Normal
    super().__init__(Normal(loc, scale), low=min_value, high=max_value)


class qUniform(Quantized):
  """Quantized Uniform (reference ``quantized.py:479``)."""

  def __init__(self, low=0.0, high=1.0, min_value=None, max_value=None):
    from odin_tpu.bay.distributions.continuous import Uniform
    super().__init__(Uniform(low, high), low=min_value, high=max_value)
