"""Cycle-consistent VAE on same-class pairs.

Reference: ``odin/bay/vi/autoencoder/cycle_vae.py`` declares
`CycleConsistentVAE` as a docstring-only stub (it does not even subclass the
VAE base).  Implemented for real here following the cited paper, Jha et al.
2018 ("Disentangling Factors of Variation with Cycle-Consistent Variational
Auto-Encoders", arXiv:1804.10469):

- the latent splits into a *specified* part ``s`` (class/content,
  deterministic head) and an *unspecified* Gaussian part ``z`` (style, with
  the usual KL to N(0, I));
- **forward cycle**: for a same-class pair (x1, x2) the decoder must
  reconstruct x1 from ``(s2, z1)`` and x2 from ``(s1, z2)`` — swapping the
  specified factors within the class leaves the image class unchanged, so
  ``s`` is forced to carry exactly the class-shared information;
- **reverse cycle**: one style sample ``z' ~ N(0, I)`` decoded with both
  specified codes then re-encoded must give back the same style:
  ``|z'_1 - z'_2|_1`` is penalized (`cycle_weight`).

Batches are pairs — ``(x1, x2)`` tuples or one ``(B, 2, ...)`` array — of
observations with equal class; a single unpaired array falls back to the
plain ELBO so evaluation paths (Gym, encode/decode) keep working.

TPU notes: both members and both swapped decodes run as single ``2B``
batched passes (two encoder + two decoder MXU dispatches per step, zero
data-dependent control flow).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)

__all__ = ["CycleConsistentVAE"]


class CycleCore(nn.Module):
  """encoder -> (s deterministic, qz); decoder(concat[s, z]) -> px."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  sdim: int

  def setup(self):
    self.s_head = nn.Dense(self.sdim, name="specified")

  def encode_full(self, x, training: bool = False):
    h = self.encoder(x, training=training)
    return self.s_head(h), self.latents(h, training=training)

  def encode(self, x, training: bool = False):
    return self.encode_full(x, training=training)[1]

  def decode_pair(self, s, z, training: bool = False):
    h = self.decoder(jnp.concatenate([s, z], axis=-1), training=training)
    return self.observation(h, training=training)

  def decode(self, z, training: bool = False):
    """API-compat decode with a neutral (zero) specified code."""
    s = jnp.zeros(z.shape[:-1] + (self.sdim,), z.dtype)
    return self.decode_pair(s, z, training=training)

  def __call__(self, x, training: bool = False):
    s, qz = self.encode_full(x, training=training)
    px = self.decode_pair(s, qz.mean(), training=training)
    return px, qz


class CycleConsistentVAE(VariationalAutoencoder):
  """Jha et al. 2018 — reference ``cycle_vae.py:1`` stub, implemented."""

  def __init__(self, sdim: int = 16, cycle_weight: float = 1.0,
               **kwargs):
    self.sdim = int(sdim)
    self.cycle_weight = float(cycle_weight)
    super().__init__(**kwargs)

  def _build_core(self) -> nn.Module:
    return CycleCore(encoder=self.encoder_net, decoder=self.decoder_net,
                     latents=self.latents_head,
                     observation=self.observation_head, sdim=self.sdim)

  def _split_pair(self, batch):
    if isinstance(batch, (tuple, list)):
      x1 = batch[0]
      x2 = batch[1] if len(batch) > 1 else None
      if x2 is not None and jnp.shape(x2) != jnp.shape(x1):
        x2 = None
      return x1, x2
    x = batch
    if self.input_shape is not None and x.ndim == len(self.input_shape) + 2 \
        and x.shape[1] == 2:
      return x[:, 0], x[:, 1]
    return x, None

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x1, x2 = self._split_pair(batch)
    if x2 is None:  # unpaired fallback: self-reconstruction ELBO
      return super().elbo_components(params, x1, rng, step,
                                     training=training, mutables=mutables)
    k1, k2, k3 = jax.random.split(rng, 3)
    B = x1.shape[0]
    x12 = jnp.concatenate([x1, x2], 0)
    s, qz = self._apply(params, "encode_full", x12, rng=k1,
                        training=training, mutables=mutables)
    z = qz.sample(k2)
    s1, s2 = s[:B], s[B:]
    # forward cycle: swap specified codes within the same-class pair
    s_swap = jnp.concatenate([s2, s1], 0)
    px = self._apply(params, "decode_pair", s_swap, z, rng=k1,
                     training=training, mutables=mutables)
    llk = {"llk_observation": 0.5 * (px.log_prob(x12)[:B] +
                                     px.log_prob(x12)[B:])}
    kl_z = kl_divergence(qz, self.latents_prior, analytic=self.analytic,
                         q_sample=z if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl = {"kl_latents": 0.5 * (kl_z[:B] + kl_z[B:])}
    # reverse cycle: one prior style through both specified codes must
    # re-encode to the same style
    z_prior = self.latents_prior.sample(k3, (B,))
    z_prior2 = jnp.concatenate([z_prior, z_prior], 0)
    px_gen = self._apply(params, "decode_pair", s, z_prior2, rng=k1,
                         training=training, mutables=mutables)
    x_gen = px_gen.mean().reshape((2 * B,) + tuple(x1.shape[1:]))
    qz_cyc = self._apply(params, "encode", x_gen, rng=k1,
                         training=training, mutables=mutables)
    m = qz_cyc.mean()
    kl["cycle_consistency"] = self.cycle_weight * jnp.sum(
        jnp.abs(m[:B] - m[B:]), axis=-1)
    aux = dict(qz=qz, px=px, z=z[:B], x=x1, y=None, s=s1)
    return llk, kl, aux
