"""Deterministic baselines (reference:
``odin/bay/vi/autoencoder/deterministic.py:105,135``).

`Autoencoder` lives in variational_autoencoder.py; `DistEncoder` here trains
an encoder-only model mapping inputs to a distribution over targets (a
probabilistic regressor with the VAE training machinery).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    Autoencoder,
    VariationalAutoencoder,
)

__all__ = ["Autoencoder", "DistEncoder"]


class DistEncoder(VariationalAutoencoder):
  """Encoder + distribution head trained by maximum likelihood of the
  TARGET given the input: batches are (x, y) and the loss is
  ``-log q(y | encoder(x))`` (reference ``deterministic.py:135``)."""

  def __init__(self, latents: Optional[RVconf] = None, **kwargs):
    if latents is None:
      latents = RVconf(10, "onehot", projection=True, name="targets")
    super().__init__(latents=latents, **kwargs)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    if y is None:
      y = x  # self-supervised fallback: model the input distribution
    qy = self._apply(params, "encode", x, rng=rng, training=training,
                     mutables=mutables)
    llk = {"llk_targets": qy.log_prob(y)}
    kl = {"kl": jnp.zeros(jnp.shape(x)[0])}
    return llk, kl, dict(qz=qy, px=qy, z=qy.mean(), x=x, y=y)

  def predict(self, x, seed: int = 0):
    return self.encode(x, seed=seed)
