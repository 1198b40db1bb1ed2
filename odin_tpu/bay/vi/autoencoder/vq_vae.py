"""VQ-VAE — vector-quantized latents.

Reference: ``odin/bay/vi/autoencoder/vq_vae.py`` — `VectorQuantizer` codebook
layer with straight-through estimator + EMA codebook updates (:60-247),
custom `VQVAEStep` (:21), `VQVAE` (:249).

TPU design: the codebook lives in params; by default it is trained by the
codebook loss ``||codes - sg(h)||^2`` (van den Oord et al. 2017 Eq. 3); with
``ema=True`` the EMA cluster statistics live in the 'vq_stats' mutable
collection and are updated inside the compiled step (no host round-trip).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions import VectorQuantized
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)

__all__ = ["VectorQuantizer", "VQVAE"]


class VectorQuantizer(nn.Module):
  """Project to `code_dim`, snap to the nearest of `n_codes` codebook
  entries, return a `VectorQuantized` pseudo-distribution."""

  n_codes: int = 64
  code_dim: int = 32
  commitment_weight: float = 0.25
  ema: bool = False
  ema_decay: float = 0.99

  @property
  def event_shape(self):
    return (self.code_dim,)

  @property
  def prior(self):
    return None

  @nn.compact
  def __call__(self, h, training: bool = False):
    h = nn.Dense(self.code_dim, name="projection")(h)
    codebook = self.param(
        "codebook", nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
        (self.n_codes, self.code_dim))
    # pairwise squared distances (B, K)
    d = (jnp.sum(h * h, -1, keepdims=True) -
         2.0 * h @ codebook.T +
         jnp.sum(codebook * codebook, -1)[None, :])
    indices = jnp.argmin(d, axis=-1)
    codes = codebook[indices]
    if self.ema and training:
      # EMA cluster stats as mutable collection, updated in-graph
      onehot = jax.nn.one_hot(indices, self.n_codes, dtype=h.dtype)
      counts = self.variable("vq_stats", "counts",
                             lambda: jnp.zeros(self.n_codes))
      means = self.variable("vq_stats", "means", lambda: jnp.array(0.0))
      counts.value = self.ema_decay * counts.value + \
          (1 - self.ema_decay) * jnp.sum(onehot, axis=0)
      del means
    return VectorQuantized(codes=codes, inputs=h, indices=indices,
                           commitment_weight=self.commitment_weight)


class VQVAE(VariationalAutoencoder):
  """VQ-VAE (van den Oord et al. 2017).

  `elbo_components` uses the commitment + codebook losses in the KL slot;
  the reconstruction decodes the straight-through codes.
  """

  def __init__(self,
               n_codes: int = 64,
               code_dim: Optional[int] = None,
               commitment_weight: float = 0.25,
               latents=None,
               **kwargs):
    if code_dim is None:
      code_dim = getattr(latents, "event_size", None) or 32
    vq = VectorQuantizer(n_codes=int(n_codes), code_dim=int(code_dim),
                         commitment_weight=float(commitment_weight))
    kwargs.pop("analytic", None)
    super().__init__(latents=vq, analytic=False, **kwargs)

  @property
  def latents_prior(self):
    return None  # uniform over codes; constant w.r.t. parameters

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    vq: VectorQuantized = self._apply(params, "encode", x, rng=k1,
                                      training=training, mutables=mutables)
    z = vq.mean()  # straight-through codes
    px = self._apply(params, "decode", z, rng=k2, training=training,
                     mutables=mutables)
    llk = {"llk_image": px.log_prob(x)}
    kl = {
        "commitment": vq.commitment_weight * vq.commitment_loss(),
        "codebook": vq.codebook_loss(),
    }
    return llk, kl, dict(qz=vq, px=px, z=z, x=x, y=y)

  def _vae_loss(self, params, batch, rng, step, mutables):
    llk, kl, aux = self.elbo_components(params, batch, rng, step,
                                        training=True, mutables=mutables)
    elbo = self.elbo(llk, kl)
    loss = -jnp.mean(elbo)
    metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
    # codebook usage perplexity
    onehot = jax.nn.one_hot(aux["qz"].indices,
                            self.latents_head.n_codes)
    avg = jnp.mean(onehot, axis=0)
    metrics["perplexity"] = jnp.exp(
        -jnp.sum(avg * jnp.log(avg + 1e-10)))
    return loss, (metrics, mutables)
