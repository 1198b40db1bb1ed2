"""VectorQuantized pseudo-distribution for VQ-VAE.

Reference: ``odin/bay/distributions/vector_quantizer.py:12`` — a deterministic
distribution over codebook vectors carrying the commitment/codebook losses and
the straight-through gradient estimator.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from odin_tpu.bay.distributions.base import Distribution

__all__ = ["VectorQuantized"]


class VectorQuantized(Distribution):
  """Point mass at the straight-through quantized codes.

  Attributes:
    codes: quantized vectors (nearest codebook entries), same shape as inputs.
    inputs: the pre-quantization encoder outputs.
    indices: integer code assignments.
  """

  _params = ("codes", "inputs", "indices")
  _static = ("commitment_weight",)

  def __init__(self, codes, inputs, indices, commitment_weight: float = 0.25):
    self.codes = jnp.asarray(codes)
    self.inputs = jnp.asarray(inputs)
    self.indices = jnp.asarray(indices)
    self.commitment_weight = float(commitment_weight)

  @property
  def batch_shape(self):
    return jnp.shape(self.codes)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.codes)[-1:]

  def sample(self, seed, sample_shape=()):
    del seed
    # straight-through estimator: forward = codes, backward = identity on inputs
    st = self.inputs + jax.lax.stop_gradient(self.codes - self.inputs)
    return jnp.broadcast_to(st, tuple(sample_shape) + st.shape)

  def mean(self):
    return self.inputs + jax.lax.stop_gradient(self.codes - self.inputs)

  def mode(self):
    return self.codes

  def log_prob(self, x):
    return jnp.zeros(self.batch_shape)

  def commitment_loss(self):
    """||sg(codes) - inputs||^2 — pulls encoder outputs toward the codes."""
    return jnp.sum((jax.lax.stop_gradient(self.codes) - self.inputs) ** 2, axis=-1)

  def codebook_loss(self):
    """||codes - sg(inputs)||^2 — moves codebook entries toward encodings
    (used when the codebook is trained by gradient rather than EMA)."""
    return jnp.sum((self.codes - jax.lax.stop_gradient(self.inputs)) ** 2, axis=-1)

  def kl_divergence(self, other=None, **kwargs):
    """VQ 'KL' = commitment loss (weighted), matching the reference's use of
    the latent regularizer slot."""
    return self.commitment_weight * self.commitment_loss()
