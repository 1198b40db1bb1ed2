"""Stochastic (variational) weight initializers.

Reference: ``odin/bay/stochastic_initializers.py:43`` (`TrainableNormal`) —
weights drawn from a trainable Normal; here flax initializer factories plus
a variational-dense layer whose kernel is sampled each call.
"""
from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["trainable_normal_init", "VariationalDense", "StochasticVariable",
           "TrainableNormal", "TrainableNormalSharedScale",
           "trainable_normal", "trainable_normal_shared_scale"]


class StochasticVariable(nn.Module):
  """A variable that IS a distribution (reference
  ``stochastic_initializers.py:15``): calling the module returns the
  distribution built from its trainable parameters; `sample_shape`
  configures default sampling."""

  sample_shape: Tuple[int, ...] = ()

  def distribution(self):
    raise NotImplementedError

  def __call__(self):
    return self.distribution()


class TrainableNormal(StochasticVariable):
  """Trainable factorized-Normal variable (reference :43): loc + scale
  parameters with a softplus scale activation; `shared_scale` collapses the
  scale to a scalar (reference `TrainableNormalSharedScale`, :91)."""

  shape: Tuple[int, ...] = ()
  loc_init_stddev: float = 0.05
  scale_init: float = -2.0
  shared_scale: bool = False

  @nn.compact
  def distribution(self):
    from odin_tpu.bay.distributions.base import Independent
    from odin_tpu.bay.distributions.continuous import Normal
    loc = self.param("loc", trainable_normal_init(0.0, self.loc_init_stddev),
                     tuple(self.shape))
    scale_shape = () if self.shared_scale else tuple(self.shape)
    rho = self.param("scale", nn.initializers.constant(self.scale_init),
                     scale_shape)
    scale = jnp.broadcast_to(jax.nn.softplus(rho), tuple(self.shape))
    return Independent(Normal(loc, scale),
                       max(len(tuple(self.shape)), 1))

  def sample(self, seed, sample_shape=None):
    d = self.distribution()
    return d.sample(seed, self.sample_shape if sample_shape is None
                    else sample_shape)


class TrainableNormalSharedScale(TrainableNormal):
  """Reference ``stochastic_initializers.py:91``."""

  shared_scale: bool = True


trainable_normal = TrainableNormal
trainable_normal_shared_scale = TrainableNormalSharedScale


def trainable_normal_init(mean: float = 0.0, stddev: float = 0.05) -> Callable:
  """Initializer sampling N(mean, stddev) — the deterministic-init face of
  TrainableNormal."""

  def init(key, shape, dtype=jnp.float32):
    return mean + stddev * jax.random.normal(key, shape, dtype)

  return init


class VariationalDense(nn.Module):
  """Dense layer with a factorized-Gaussian posterior over its kernel
  (Bayes-by-backprop): kernel ~ N(mu, softplus(rho)) resampled per call via
  the 'sample' rng; `kl()` gives the weight KL to a N(0, prior_scale)
  prior."""

  features: int
  prior_scale: float = 1.0

  @nn.compact
  def __call__(self, x, training: bool = False):
    d = x.shape[-1]
    mu = self.param("kernel_mu", nn.initializers.lecun_normal(),
                    (d, self.features))
    rho = self.param("kernel_rho", nn.initializers.constant(-5.0),
                     (d, self.features))
    bias = self.param("bias", nn.initializers.zeros, (self.features,))
    sigma = jax.nn.softplus(rho)
    if training:
      eps = jax.random.normal(self.make_rng("sample"), mu.shape)
      kernel = mu + sigma * eps
    else:
      kernel = mu
    # store the analytic weight KL for the loss to collect
    kl = jnp.sum(jnp.log(self.prior_scale / sigma) +
                 (sigma ** 2 + mu ** 2) / (2 * self.prior_scale ** 2) - 0.5)
    self.sow("losses", "kernel_kl", kl)
    return x @ kernel + bias
