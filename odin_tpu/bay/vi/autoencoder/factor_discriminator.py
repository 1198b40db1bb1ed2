"""FactorDiscriminator — the TC density-ratio network of FactorVAE.

Reference: ``odin/bay/vi/autoencoder/factor_discriminator.py`` —
`total_correlation` = mean logits (:169-199), `dtc_loss` real-vs-permuted
cross-entropy (:200-236), `supervised_loss` (:237-267), `_tc_logits`
ss_strategy reduction (:137-168).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.networks.base import BatchNorm, Dense, Lambda, SequentialNetwork

__all__ = ["FactorDiscriminator"]


class FactorDiscriminator(nn.Module):
  """MLP discriminator D(z); the first output unit is the real-vs-permuted
  logit, extra units (semi-supervised) are label logits reduced by
  `ss_strategy` for the TC estimate."""

  units: Tuple[int, ...] = (1000, 1000, 1000, 1000, 1000)
  activation: str = "relu"
  batchnorm: bool = False
  n_outputs: int = 1
  ss_strategy: str = "logsumexp"

  @nn.compact
  def __call__(self, z, training: bool = False):
    h = z
    for u in self.units:
      h = Dense(int(u), activation=None if self.batchnorm else self.activation)(h)
      if self.batchnorm:
        h = BatchNorm()(h, training=training)
        from odin_tpu.networks.base import get_activation
        h = get_activation(self.activation)(h)
    logits = Dense(self.n_outputs, activation=None)(h)
    return logits

  # -- pure loss helpers (operate on raw logits) ----------------------------
  def tc_logits(self, logits: jax.Array) -> jax.Array:
    """Reduce multi-output logits to the single TC logit
    (reference `_tc_logits`, :137-168)."""
    if self.n_outputs == 1:
      return logits[..., 0]
    red = {"sum": jnp.sum, "mean": jnp.mean, "max": jnp.max, "min": jnp.min,
           "logsumexp": jax.scipy.special.logsumexp}[self.ss_strategy]
    return red(logits, axis=-1)


def total_correlation_logits(tc_logit: jax.Array) -> jax.Array:
  """TC(z) ~ E_q(z)[log D(z) - log(1 - D(z))] = mean of the raw logit
  (reference :169-199)."""
  return jnp.mean(tc_logit)


def dtc_loss_logits(z_logit: jax.Array, zperm_logit: jax.Array) -> jax.Array:
  """Discriminator loss, Algorithm 2 of Kim & Mnih 2018: classify real codes
  as 1 and permuted codes as 0 (reference :200-236):
  ``0.5 (mean softplus(-D(z)) + mean softplus(D(z~)))``."""
  return 0.5 * (jnp.mean(jax.nn.softplus(-z_logit)) +
                jnp.mean(jax.nn.softplus(zperm_logit)))
