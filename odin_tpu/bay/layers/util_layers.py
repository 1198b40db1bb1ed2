"""Distribution utility layers.

Reference: ``odin/bay/layers/distribution_util_layers.py`` — small Keras
layers bridging distribution outputs back into tensor pipelines
(`Sampling`, `Moments`, `Stddev`, `DistributionAttr`,
`ConditionalTensorLayer`).  Here they are flax modules over the repo's
pytree :class:`~odin_tpu.bay.distributions.Distribution` objects, so they
compose inside jitted networks (distributions cross module boundaries as
pytrees; sampling draws from the ``sample`` rng stream).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from odin_tpu.bay.distributions import ConditionalTensor, Distribution

__all__ = ["Sampling", "Moments", "Stddev", "DistributionAttr",
           "ConditionalTensorLayer"]


class Sampling(nn.Module):
  """Draw `sample_shape` samples from an input distribution (reference
  ``distribution_util_layers.py:51``); a plain tensor is passed through
  with the sample dims prepended, mirroring the reference's broadcast."""

  sample_shape: Tuple[int, ...] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    if isinstance(x, Distribution):
      return x.sample(self.make_rng("sample"), tuple(self.sample_shape))
    for _ in range(len(self.sample_shape)):
      x = jnp.expand_dims(x, 0)
    return x


class Moments(nn.Module):
  """Extract mean and/or variance of a distribution (reference
  ``distribution_util_layers.py:75``); identity on plain tensors."""

  mean: bool = True
  variance: bool = True

  def __call__(self, x, training: bool = False):
    assert self.mean or self.variance, "must return mean or variance"
    if not isinstance(x, Distribution):
      return x
    out = []
    if self.mean:
      out.append(x.mean())
    if self.variance:
      out.append(x.variance())
    return out[0] if len(out) == 1 else tuple(out)


class Stddev(nn.Module):
  """Standard deviation of an input distribution; identity on tensors
  (reference ``distribution_util_layers.py:106``)."""

  def __call__(self, x, training: bool = False):
    return x.stddev() if isinstance(x, Distribution) else x


class DistributionAttr(nn.Module):
  """Extract a (dotted) attribute from a distribution, e.g.
  ``'distribution.concentration'`` (reference
  ``distribution_util_layers.py:123``).  Attributes that are methods on the
  pytree distributions (``mean``, ``stddev``...) are called."""

  attr_name: str = "mean"

  def __call__(self, x, training: bool = False):
    for name in self.attr_name.split("."):
      x = getattr(x, name)
      if callable(x) and not isinstance(x, Distribution):
        x = x()
    return x


class ConditionalTensorLayer(nn.Module):
  """Concatenate a conditioning tensor onto all statistics of a
  distribution — the CVAE helper (reference
  ``distribution_util_layers.py:33``): ``(dist, tensor) ->
  ConditionalTensor`` whose samples/means carry the condition appended on
  the event axis while densities/KL ignore it."""

  def __call__(self, inputs, training: bool = False):
    dist, tensor = inputs
    assert isinstance(dist, Distribution), dist
    return ConditionalTensor(dist, jnp.asarray(tensor))
