"""Conditional distribution wrapper for conditional VAEs.

Reference: ``odin/bay/distributions/conditional.py:14`` (ConditionalTensor).
Concatenates a conditioning tensor (e.g. one-hot labels) to every sample on
the event axis, so a CVAE decoder sees ``[z, y]`` while density quantities
(log_prob, entropy, KL) remain those of the underlying latent distribution.
"""
from __future__ import annotations

import jax.numpy as jnp

from odin_tpu.bay.distributions.base import (Distribution, exact_kl,
                                             register_kl)

__all__ = ["ConditionalTensor"]


class ConditionalTensor(Distribution):
  """Wrap `distribution` so samples and point statistics carry
  `conditional_tensor` appended on the last (event) axis.

  - ``sample/mean/mode/variance/stddev`` -> ``concat([base, tensor], -1)``
  - ``log_prob/entropy`` -> the base distribution's (the conditioning is
    observed, it has no density).  Unlike the reference — which forwards
    ``x`` unchanged and therefore cannot score its own samples — an ``x``
    with the full concatenated event dim has the conditioning slice
    stripped before delegation.
  - KL(ConditionalTensor || ConditionalTensor) ignores the tensors
    (reference :128).
  """

  _params = ("distribution", "conditional_tensor")
  _static = ()

  def __init__(self, distribution: Distribution, conditional_tensor):
    self.distribution = distribution
    self.conditional_tensor = jnp.asarray(conditional_tensor)

  # -- shapes ---------------------------------------------------------------
  @property
  def batch_shape(self):
    return self.distribution.batch_shape

  @property
  def event_shape(self):
    ev = self.distribution.event_shape
    base = ev[-1] if ev else 1
    return tuple(ev[:-1]) + (base + self.conditional_tensor.shape[-1],)

  @property
  def dtype(self):
    return self.distribution.dtype

  def _base_event_dim(self) -> int:
    ev = self.distribution.event_shape
    return ev[-1] if ev else 1

  def _concat(self, x):
    t = jnp.broadcast_to(
        self.conditional_tensor,
        x.shape[:-1] + self.conditional_tensor.shape[-1:]).astype(x.dtype)
    return jnp.concatenate([x, t], axis=-1)

  # -- sampling / statistics --------------------------------------------------
  def sample(self, seed, sample_shape=()):
    s = self.distribution.sample(seed, sample_shape)
    if not self.distribution.event_shape:
      s = s[..., None]
    return self._concat(s)

  def log_prob(self, x):
    x = jnp.asarray(x)
    full = self.event_shape[-1]
    base = self._base_event_dim()
    if x.shape[-1] == full:
      x = x[..., :base]
    if not self.distribution.event_shape:
      x = jnp.squeeze(x, -1)
    return self.distribution.log_prob(x)

  def _stat(self, name):
    v = getattr(self.distribution, name)()
    if not self.distribution.event_shape:
      v = v[..., None]
    return self._concat(v)

  def mean(self):
    return self._stat("mean")

  def mode(self):
    return self._stat("mode")

  def variance(self):
    return self._stat("variance")

  def stddev(self):
    return self._stat("stddev")

  def entropy(self):
    return self.distribution.entropy()

  def __repr__(self):
    return (f"ConditionalTensor({self.distribution!r}, "
            f"tensor={self.conditional_tensor.shape})")


@register_kl(ConditionalTensor, ConditionalTensor)
def _kl_conditional(q: ConditionalTensor, p: ConditionalTensor):
  # the conditioning tensor is observed — KL is the latents' (reference :128)
  return exact_kl(q.distribution, p.distribution)
