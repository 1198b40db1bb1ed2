"""Deterministic (point-mass) distributions and the Batchwise concatenation.

Reference: tfd.Deterministic/VectorDeterministic aliases
('deterministic'/'vdeterministic') and the `Batchwise` concat-of-batches
distribution (``odin/bay/distributions/batchwise.py:18``) used by the
DisentanglementGym to collect per-minibatch posteriors.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions.base import Distribution, register_kl

__all__ = ["Deterministic", "VectorDeterministic", "Batchwise"]


class Deterministic(Distribution):
  _params = ("loc",)
  _static = ("atol",)

  def __init__(self, loc, atol: float = 0.0):
    self.loc = jnp.asarray(loc)
    self.atol = float(atol)

  @property
  def batch_shape(self):
    return jnp.shape(self.loc)

  def sample(self, seed, sample_shape=()):
    del seed
    return jnp.broadcast_to(self.loc, tuple(sample_shape) + self.batch_shape)

  def log_prob(self, x):
    eq = jnp.abs(x - self.loc) <= self.atol
    return jnp.where(eq, 0.0, -jnp.inf)

  def mean(self):
    return self.loc

  def mode(self):
    return self.loc

  def variance(self):
    return jnp.zeros_like(self.loc)

  def entropy(self):
    return jnp.zeros(self.batch_shape)


class VectorDeterministic(Deterministic):
  """Point mass whose last axis is the event."""

  @property
  def batch_shape(self):
    return jnp.shape(self.loc)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.loc)[-1:]

  def log_prob(self, x):
    eq = jnp.all(jnp.abs(x - self.loc) <= self.atol, axis=-1)
    return jnp.where(eq, 0.0, -jnp.inf)

  def entropy(self):
    return jnp.zeros(self.batch_shape)


class Batchwise(Distribution):
  """Concatenate a list of same-family distributions along a batch axis.

  Host-side container (used during evaluation sweeps, not in compiled steps):
  delegates sample/log_prob/mean to each shard and concatenates.
  Reference: ``odin/bay/distributions/batchwise.py:18``.
  """

  _params = ("distributions",)
  _static = ("axis",)

  def __init__(self, distributions: Sequence[Distribution], axis: int = 0):
    self.distributions = tuple(distributions)
    self.axis = int(axis)

  @property
  def batch_shape(self):
    shapes = [d.batch_shape for d in self.distributions]
    total = sum(s[self.axis] for s in shapes)
    out = list(shapes[0])
    out[self.axis] = total
    return tuple(out)

  @property
  def event_shape(self):
    return self.distributions[0].event_shape

  def _split(self, x):
    sizes = [d.batch_shape[self.axis] for d in self.distributions]
    idx = np.cumsum(sizes)[:-1]
    e = len(self.event_shape)
    axis = self.axis if self.axis >= 0 else x.ndim - e + self.axis
    return jnp.split(x, idx, axis=axis)

  def sample(self, seed, sample_shape=()):
    seeds = jax.random.split(seed, len(self.distributions))
    outs = [d.sample(s, sample_shape) for d, s in zip(self.distributions, seeds)]
    e = len(self.event_shape)
    axis = self.axis + len(tuple(sample_shape))
    return jnp.concatenate(outs, axis=axis)

  def log_prob(self, x):
    parts = self._split(x)
    return jnp.concatenate(
        [d.log_prob(p) for d, p in zip(self.distributions, parts)], axis=self.axis)

  def mean(self):
    return jnp.concatenate([d.mean() for d in self.distributions], axis=self.axis)

  def mode(self):
    return jnp.concatenate([d.mode() for d in self.distributions], axis=self.axis)

  def variance(self):
    return jnp.concatenate([d.variance() for d in self.distributions], axis=self.axis)

  def kl_divergence(self, other, **kwargs):
    if isinstance(other, Batchwise):
      return jnp.concatenate(
          [q.kl_divergence(p, **kwargs)
           for q, p in zip(self.distributions, other.distributions)], axis=self.axis)
    return jnp.concatenate(
        [q.kl_divergence(other, **kwargs) for q in self.distributions], axis=self.axis)
