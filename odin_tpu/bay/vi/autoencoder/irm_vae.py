"""Implicit Rank-Minimizing (Variational) Autoencoder.

Reference: ``odin/bay/vi/autoencoder/irm_vae.py:100,148`` — a chain of
activation-free linear layers inserted between encoder and bottleneck;
SGD implicitly minimizes the rank of the latent codes
(Jing, Zbontar & LeCun 2020).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)
from odin_tpu.networks.base import SequentialNetwork

__all__ = ["ImplicitRankMinimizer", "irmVAE", "irmAE"]


class ImplicitRankMinimizer(nn.Module):
  """`n_layers` linear (no bias, no activation) matmuls; optionally sharing
  one weight matrix (reference ``irm_vae.py:20-98``)."""

  units: int = 64
  n_layers: int = 3
  share_weights: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    if self.share_weights:
      dense = nn.Dense(self.units, use_bias=False, name="irm_shared")
      for _ in range(self.n_layers):
        x = dense(x)
    else:
      for i in range(self.n_layers):
        x = nn.Dense(self.units, use_bias=False, name=f"irm_{i}")(x)
    return x


class irmVAE(VariationalAutoencoder):
  """VAE with an IRM linear chain appended to the encoder."""

  def __init__(self,
               latents=None,
               n_layers: int = 3,
               share_weights: bool = False,
               irm_units: int = 64,
               encoder=None,
               **kwargs):
    if latents is None:
      latents = RVconf(64, "mvndiag", projection=True, name="latents")
    if encoder is not None:
      layers = tuple(encoder.layers) if isinstance(encoder, SequentialNetwork) \
          else (encoder,)
      encoder = SequentialNetwork(
          layers + (ImplicitRankMinimizer(units=int(irm_units),
                                          n_layers=int(n_layers),
                                          share_weights=share_weights),),
          name="encoder_irm")
    super().__init__(latents=latents, encoder=encoder, **kwargs)


class irmAE(irmVAE):
  """Deterministic IRM autoencoder (latents forced to vdeterministic,
  reference ``irm_vae.py:148``)."""

  def __init__(self, latents=None, **kwargs):
    if latents is None:
      latents = RVconf(64, "vdeterministic", projection=True, name="latents")
    elif isinstance(latents, RVconf):
      latents = latents.copy(posterior="vdeterministic")
    super().__init__(latents=latents, **kwargs)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    qz = self._apply(params, "encode", x, rng=rng, training=training,
                     mutables=mutables)
    z = qz.mean()
    px = self._apply(params, "decode", z, rng=rng, training=training,
                     mutables=mutables)
    llk = {"llk_observation": px.log_prob(x)}
    kl = {"kl_latents": jnp.zeros(z.shape[0])}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)
