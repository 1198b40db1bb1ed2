"""StochasticVAE / ImputeVAE.

Reference: ``odin/bay/vi/autoencoder/stochastic_vae.py:51,116`` —
alternating posterior/likelihood optimization stages and missing-data
imputation by iterative encode/decode.
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE
from odin_tpu.training.core import TrainStep

__all__ = ["StochasticVAE", "ImputeVAE"]


class StochasticVAE(BetaVAE):
  """Alternate encoder-only and decoder-only update stages
  (reference ``stochastic_vae.py:51``).  Realized as two TrainSteps over the
  same ELBO whose gradients flow into disjoint halves of the 'vae'
  partition via stop-gradients."""

  def _encoder_loss(self, params, batch, rng, step, mutables):
    llk, kl, _ = self.elbo_components(params, batch, rng, step,
                                      training=True, mutables=mutables)
    elbo = self.elbo(llk, kl)
    loss = -jnp.mean(elbo)
    return loss, ({f"enc_{k}": jnp.mean(v) for k, v in kl.items()}, mutables)

  def _decoder_loss(self, params, batch, rng, step, mutables):
    llk, kl, _ = self.elbo_components(params, batch, rng, step,
                                      training=True, mutables=mutables)
    loss = -jnp.mean(self.elbo(llk, kl))
    return loss, ({f"dec_{k}": jnp.mean(v) for k, v in llk.items()}, mutables)

  def train_steps(self) -> List[TrainStep]:
    return [
        TrainStep(loss_fn=self._encoder_loss, partitions=("vae",),
                  optimizer="vae", name="posterior"),
        TrainStep(loss_fn=self._decoder_loss, partitions=("vae",),
                  optimizer="vae", name="likelihood"),
    ]


class ImputeVAE(BetaVAE):
  """VAE with iterative missing-data imputation
  (reference ``stochastic_vae.py:116``)."""

  def impute(self, x, mask, n_iter: int = 10, seed: int = 0):
    """Fill masked-out entries (mask=1 observed, 0 missing) by repeated
    encode -> decode -> replace-missing."""
    x = jnp.asarray(x)
    mask = jnp.asarray(mask, x.dtype)
    x_hat = x * mask
    for i in range(int(n_iter)):
      qz = self.encode(x_hat, seed=seed + i)
      px = self.decode(qz.mean(), seed=seed + i)
      recon = px.mean()
      x_hat = x * mask + recon * (1.0 - mask)
    return x_hat
