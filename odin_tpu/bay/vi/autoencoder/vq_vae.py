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
    init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
    if self.ema:
      # EMA codebook (van den Oord et al. 2017 appendix A.1): the codebook
      # is NOT a gradient parameter — it lives in the 'vq_stats' mutable
      # collection and is updated in-graph by exponential moving averages
      # of cluster counts/means (reference `vq_vae.py:153-186`).
      cb = self.variable(
          "vq_stats", "codebook",
          lambda: init(jax.random.PRNGKey(0),
                       (self.n_codes, self.code_dim), jnp.float32))
      # counts init to 1 (not 0): codebook = means/counts stays at its
      # init value until real assignments accumulate — zero-init divides
      # by the Laplace epsilon and explodes the first update
      counts = self.variable("vq_stats", "counts",
                             lambda: jnp.ones(self.n_codes))
      # copy — sharing the codebook's buffer breaks arg donation (donate
      # of the same buffer twice) in the fused train step
      means = self.variable("vq_stats", "means", lambda: cb.value.copy())
      codebook = cb.value
    else:
      codebook = self.param("codebook", init,
                            (self.n_codes, self.code_dim))
    # pairwise squared distances (B, K)
    d = (jnp.sum(h * h, -1, keepdims=True) -
         2.0 * h @ codebook.T +
         jnp.sum(codebook * codebook, -1)[None, :])
    indices = jnp.argmin(d, axis=-1)
    codes = codebook[indices]
    if self.ema and training:
      hs = jax.lax.stop_gradient(h)
      onehot = jax.nn.one_hot(indices, self.n_codes, dtype=hs.dtype)
      counts.value = self.ema_decay * counts.value + \
          (1 - self.ema_decay) * jnp.sum(onehot, axis=0)
      means.value = self.ema_decay * means.value + \
          (1 - self.ema_decay) * (onehot.T @ hs)
      # Laplace smoothing so empty clusters do not divide by zero
      n = jnp.sum(counts.value)
      smoothed = ((counts.value + 1e-5) /
                  (n + self.n_codes * 1e-5) * n)
      cb.value = means.value / smoothed[:, None]
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
               ema: bool = False,
               ema_decay: float = 0.99,
               latents=None,
               **kwargs):
    if code_dim is None:
      code_dim = getattr(latents, "event_size", None) or 32
    vq = VectorQuantizer(n_codes=int(n_codes), code_dim=int(code_dim),
                         commitment_weight=float(commitment_weight),
                         ema=bool(ema), ema_decay=float(ema_decay))
    kwargs.pop("analytic", None)
    super().__init__(latents=vq, analytic=False, **kwargs)

  @property
  def latents_prior(self):
    return None  # uniform over codes; constant w.r.t. parameters

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    mutables = mutables or {}
    if self.latents_head.ema and training and mutables:
      variables = {"params": params["vae"], **mutables}
      r1, r2 = jax.random.split(k1)
      vq, updated = self.core.apply(
          variables, x, training=True, method=self.core.encode,
          rngs={"dropout": r1, "sample": r2},
          mutable=list(mutables.keys()))
      mutables = {**mutables, **dict(updated)}
    else:
      vq = self._apply(params, "encode", x, rng=k1,
                       training=training, mutables=mutables)
    z = vq.mean()  # straight-through codes
    px = self._apply(params, "decode", z, rng=k2, training=training,
                     mutables=mutables)
    llk = {"llk_image": px.log_prob(x)}
    kl = {"commitment": vq.commitment_weight * vq.commitment_loss()}
    if not self.latents_head.ema:  # EMA mode updates the codebook itself
      kl["codebook"] = vq.codebook_loss()
    return llk, kl, dict(qz=vq, px=px, z=z, x=x, y=y, mutables=mutables)

  def encode_codes(self, x, seed: int = 0) -> jax.Array:
    """x -> integer codebook indices (the discrete latent)."""
    vq = self.encode(x, seed=seed)
    return vq.indices

  def decode_codes(self, indices):
    """Integer code indices -> p(x|codebook[indices]) (reference example
    ``vae_discrete_test.py``: sampling images from random code grids)."""
    params = self._params_of()
    if self.latents_head.ema:
      codebook = self.state.mutables["vq_stats"]["latents"]["codebook"]
    else:
      codebook = params["vae"]["latents"]["codebook"]
    z = jnp.asarray(codebook)[jnp.asarray(indices)]
    return self.decode(z)

  def _vae_loss(self, params, batch, rng, step, mutables):
    llk, kl, aux = self.elbo_components(params, batch, rng, step,
                                        training=True, mutables=mutables)
    mutables = aux.get("mutables", mutables)
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
