"""Structured dropout layers.

Reference: ``odin/networks/dropout.py`` — `DiscreteDropout` (Binomial
corruption of count-valued inputs) and `DropBlock` (Ghiasi'18 contiguous-
region dropout for conv feature maps).  Both are flax modules drawing from
the ``dropout`` rng stream; at eval time they are the identity.

TPU notes: DropBlock's block dilation is one ``lax.reduce_window`` max-pool
(fused by XLA); DiscreteDropout's Binomial thinning uses
``jax.random.binomial`` which lowers to a vectorized rejection sampler —
both are static-shape, scan/jit-safe.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DiscreteDropout", "DropBlock"]


class DiscreteDropout(nn.Module):
  """Binomial dropout for discrete (count) inputs (reference
  ``dropout.py:8``)::

      p ~ Bernoulli(dropout_rate)            # per noise_shape entry
      corrupted ~ Binomial(n=x, p=1-corrupt_rate)
      y = x * (1 - p) + corrupted * p

  i.e. a ``dropout_rate`` fraction of entries have their counts thinned by
  ``corrupt_rate`` (each unit count kept with prob ``1-corrupt_rate``) —
  the count-data analogue of zeroing activations.  ``noise_shape``
  broadcasts the which-entries-are-corrupted mask (e.g. ``(1, features)``
  to share the mask over a batch).
  """

  dropout_rate: float = 0.3
  corrupt_rate: float = 0.2
  noise_shape: Tuple[int, ...] | None = None

  @nn.compact
  def __call__(self, x, training: bool = False):
    if not training or self.dropout_rate <= 0.0:
      return x
    rng = self.make_rng("dropout")
    k_mask, k_bin = jax.random.split(rng)
    shape = tuple(self.noise_shape) if self.noise_shape else x.shape
    drop = jax.random.bernoulli(k_mask, self.dropout_rate, shape)
    drop = jnp.broadcast_to(drop, x.shape).astype(x.dtype)
    counts = jnp.maximum(jnp.round(x.astype(jnp.float32)), 0.0)
    corrupted = jax.random.binomial(
        k_bin, counts, 1.0 - self.corrupt_rate).astype(x.dtype)
    return x * (1.0 - drop) + corrupted * drop


class DropBlock(nn.Module):
  """DropBlock structured dropout for NHWC conv maps (reference
  ``dropout.py:76``; Ghiasi'18): square ``blocksize`` regions are zeroed
  together, and the surviving activations are rescaled by the realized
  keep fraction so the expected activation is unchanged.
  """

  rate: float = 0.1
  blocksize: int = 3

  @nn.compact
  def __call__(self, x, training: bool = False):
    if not training or self.rate <= 0.0:
      return x
    assert x.ndim == 4, "DropBlock expects NHWC inputs"
    _, height, width, _ = x.shape
    size = min(self.blocksize, width, height)
    # gamma: per-position seed rate so the expected dropped fraction is
    # `rate` after dilating each seed into a size x size block
    gamma = (self.rate * width * height / size ** 2 /
             ((width - size + 1) * (height - size + 1)))
    # seeds are only valid where the whole block fits inside the map
    h_i = jnp.arange(height)[:, None]
    w_i = jnp.arange(width)[None, :]
    valid = ((h_i >= size // 2) & (h_i < height - (size - 1) // 2) &
             (w_i >= size // 2) & (w_i < width - (size - 1) // 2))
    seeds = jax.random.bernoulli(self.make_rng("dropout"), gamma, x.shape)
    seeds = seeds & valid[None, :, :, None]
    # dilate seeds into blocks: max-pool with a size x size window
    block = jax.lax.reduce_window(
        seeds.astype(x.dtype), 0.0, jax.lax.max,
        window_dimensions=(1, size, size, 1), window_strides=(1, 1, 1, 1),
        padding="SAME")
    keep = 1.0 - block
    keep_frac = jnp.mean(keep)
    return x * keep / jnp.maximum(keep_frac, 1e-6)
