"""Multimodal Mixture-of-Experts VAE (MMVAE).

Reference: ``odin/bay/vi/autoencoder/moe_vae.py`` declares `MoeVAE` as a
docstring-only stub.  Implemented for real here following the cited paper,
Shi et al. 2019 ("Variational Mixture-of-Experts Autoencoders for
Multi-Modal Deep Generative Models", NeurIPS):

- each modality m has its own encoder and decoder/observation head over a
  SHARED latent space;
- the joint posterior is the mixture of experts
  ``q(z | x_{1:M}) = (1/M) sum_m q_m(z | x_m)``;
- the objective is estimated by stratified sampling: for each expert m,
  sample ``z_m ~ q_m`` and score ALL modality likelihoods at ``z_m``; the
  (MC) KL uses the full mixture density
  ``log q(z_m) = logsumexp_n log q_n(z_m) - log M``:

  ``ELBO = (1/M) sum_m [ sum_n log p_n(x_n | z_m)
                         - (log q(z_m) - log p(z_m)) ]``

Batches are M-tuples of per-modality arrays.  Cross-modal generation:
`cross_generate(x_m, from_mod=m, to_mod=n)`.

TPU notes: M is a small static integer — the expert loop is unrolled
python (M encoder + M*M decoder applications all batched over B); the
mixture logsumexp is a dense (M, M, B) score tensor, no control flow.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
    _as_head,
)

__all__ = ["MoeVAE"]


class MoECore(nn.Module):
  """Per-modality encoders/decoders over one shared latent space."""

  encoders: Tuple[Any, ...]
  decoders: Tuple[Any, ...]
  latent_heads: Tuple[DistributionDense, ...]
  observations: Tuple[DistributionDense, ...]

  def encode_mod(self, x, m: int, training: bool = False):
    h = self.encoders[m](x, training=training)
    return self.latent_heads[m](h, training=training)

  def decode_mod(self, z, m: int, training: bool = False):
    h = self.decoders[m](z, training=training)
    return self.observations[m](h, training=training)

  def encode(self, x, training: bool = False):
    """Modality-0 posterior (API-compat single-input surface)."""
    return self.encode_mod(x, 0, training=training)

  def decode(self, z, training: bool = False):
    return self.decode_mod(z, 0, training=training)

  def __call__(self, xs, training: bool = False):
    if not isinstance(xs, (tuple, list)):
      xs = (xs,) * len(self.encoders)
    qs = [self.encode_mod(x, m, training=training)
          for m, x in enumerate(xs)]
    px = [self.decode_mod(q.mean(), m, training=training)
          for m, q in enumerate(qs)]
    return px, qs


class MoeVAE(VariationalAutoencoder):
  """MMVAE (Shi et al. 2019) — reference ``moe_vae.py:1`` stub, implemented.

  Args:
    encoders / decoders: one module per modality.
    observations: one RVconf / head per modality (its event_shape is the
      modality's data shape).
    latents: shared-latent RVconf (each modality gets its own projection
      into the shared space).
  """

  def __init__(self,
               encoders: Sequence[Any],
               decoders: Sequence[Any],
               observations: Sequence[Any],
               latents: Any = None,
               input_shapes: Optional[Sequence[Tuple[int, ...]]] = None,
               **kwargs):
    if latents is None:
      latents = RVconf(16, "mvndiag", projection=True, name="latents")
    self.n_modalities = len(encoders)
    assert len(decoders) == self.n_modalities
    assert len(observations) == self.n_modalities
    self._moe_encoders = tuple(encoders)
    self._moe_decoders = tuple(decoders)
    self._moe_observations = tuple(
        _as_head(o, f"observation{m}") for m, o in enumerate(observations))
    self.input_shapes = (tuple(tuple(s) for s in input_shapes)
                         if input_shapes is not None else None)
    if self.input_shapes is not None:
      kwargs.setdefault("input_shape", self.input_shapes[0])
    super().__init__(encoder=encoders[0], decoder=decoders[0],
                     latents=latents, observation=observations[0], **kwargs)

  def _build_core(self) -> nn.Module:
    heads = tuple(
        DistributionDense(event_shape=self.latents_head.event_shape,
                          posterior=self.latents_head.posterior,
                          posterior_kwargs=self.latents_head.posterior_kwargs,
                          name=f"latents{m}")
        for m in range(self.n_modalities))
    return MoECore(encoders=self._moe_encoders,
                   decoders=self._moe_decoders,
                   latent_heads=heads,
                   observations=self._moe_observations)

  def build(self, input_shapes=None, seed: int = 1):
    if input_shapes is not None:
      self.input_shapes = tuple(tuple(s) for s in input_shapes)
    assert self.input_shapes is not None, "input_shapes must be provided"
    self.input_shape = tuple(self.input_shapes[0])
    rng = jax.random.PRNGKey(seed)
    xs = tuple(jnp.zeros((1,) + tuple(s), jnp.float32)
               for s in self.input_shapes)
    variables = self.core.init(
        {"params": rng, "dropout": rng, "sample": rng}, xs)
    from odin_tpu.training.core import TrainState
    self.state = TrainState(params={"vae": variables["params"]},
                            opt_states={},
                            step=jnp.zeros((), jnp.int32),
                            rng=jax.random.PRNGKey(seed + 1),
                            mutables={k: v for k, v in variables.items()
                                      if k != "params"})
    return self

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    xs = batch if isinstance(batch, (tuple, list)) else (batch,)
    M = self.n_modalities
    assert len(xs) == M, f"expected {M} modalities, got {len(xs)}"
    keys = jax.random.split(rng, M + 1)
    qs = [self._apply(params, "encode_mod", x, m, rng=keys[0],
                      training=training, mutables=mutables)
          for m, x in enumerate(xs)]
    zs = [q.sample(keys[m + 1]) for m, q in enumerate(qs)]  # stratified
    llk = {}
    for n in range(M):  # score every modality under every expert's sample
      tot = 0.0
      for m in range(M):
        px = self._apply(params, "decode_mod", zs[m], n, rng=keys[0],
                         training=training, mutables=mutables)
        tot = tot + px.log_prob(xs[n])
      llk[f"llk_mod{n}"] = tot / M
    # MC KL against the mixture posterior: log q(z_m) - log p(z_m)
    kl_terms = []
    for m in range(M):
      log_q = jax.nn.logsumexp(
          jnp.stack([q.log_prob(zs[m]) for q in qs], 0), axis=0) - jnp.log(
              float(M))
      kl_terms.append(log_q - self.latents_prior.log_prob(zs[m]))
    kl = {"kl_latents": sum(kl_terms) / M}
    aux = dict(qz=qs[0], px=None, z=zs[0], x=xs[0], y=None)
    return llk, kl, aux

  def cross_generate(self, x, from_mod: int = 0, to_mod: int = 1,
                     params=None, seed: int = 0):
    """Encode modality `from_mod`, decode into modality `to_mod`."""
    params = params if params is not None else self._params_of()
    q = self._apply(params, "encode_mod", jnp.asarray(x), from_mod,
                    rng=jax.random.PRNGKey(seed))
    return self._apply(params, "decode_mod", q.mean(), to_mod,
                       rng=jax.random.PRNGKey(seed))
