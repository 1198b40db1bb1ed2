"""Hierarchical (ladder) VAEs.

Reference: ``odin/bay/vi/autoencoder/hierarchical_vae.py`` (1,117 LoC) —
`HierarchicalVAE`/LadderVAE with `BiConvLatents`/`BiDenseLatents` decoder-
layer wrappers that merge encoder states into per-layer posterior + prior
(:130-736), per-layer KL with free-bits default 0.25, plus `UnetVAE` (:905),
`PUnetVAE` (:986), `VeryDeepVAE` (:1098).

TPU redesign: the reference wraps decoder layers in *stateful* objects that
capture encoder activations by side effect; here the ladder is explicit —
the encoder returns all hidden states, and a `LadderCore` walks the decoder
layers, inserting at each configured index a conv latent whose prior comes
from the decoder state and whose posterior additionally sees the paired
encoder state (top-down inference as in LadderVAE / VDVAE).  Sampling modes
are arguments, not mutable flags.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions import Independent, Normal
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)
from odin_tpu.training.core import TrainStep

__all__ = ["BiConvLatents", "LadderCore", "HierarchicalVAE", "LadderVAE",
           "UnetVAE", "PUnetVAE", "VeryDeepVAE"]


class BiConvLatents(nn.Module):
  """One ladder rung (reference `BiConvLatents`,
  ``hierarchical_vae.py:130-430``):

  * prior  p(z_i | z_>i):   conv(decoder state) -> (loc, scale)
  * posterior q(z_i | ...): conv(decoder state) + conv(encoder state)
    combined -> (loc, scale) (precision-weighted-style additive merge)
  * merge: deconv(z_i) back to the decoder state's spatial shape, added.
  """

  filters: int = 16
  kernel_size: int = 8
  strides: int = 4
  merge_channels: int = 64

  def setup(self):
    k = (self.kernel_size, self.kernel_size)
    s = (self.strides, self.strides)
    self.prior_conv = nn.Conv(2 * self.filters, k, strides=s, padding="SAME")
    self.post_conv_d = nn.Conv(2 * self.filters, k, strides=s, padding="SAME")
    self.post_conv_e = nn.Conv(2 * self.filters, k, strides=s, padding="SAME")
    self.merge_deconv = nn.ConvTranspose(self.merge_channels, k, strides=s,
                                         padding="SAME")

  def prior_params(self, d):
    loc, raw = jnp.split(self.prior_conv(d), 2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def posterior_params(self, d, e):
    loc, raw = jnp.split(self.post_conv_d(d) + self.post_conv_e(e), 2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def merge(self, d, z):
    up = self.merge_deconv(z)
    # crop to the decoder state's spatial dims
    up = up[:, :d.shape[1], :d.shape[2], :]
    return d + up

  def __call__(self, d, e=None, z=None, sample: bool = True):
    """Returns (new_d, qz_i, pz_i, z_i). With e=None samples from the prior
    (generation mode)."""
    p_loc, p_scale = self.prior_params(d)
    pz = Independent(Normal(p_loc, p_scale), 3)
    if e is not None:
      q_loc, q_scale = self.posterior_params(d, e)
      qz = Independent(Normal(q_loc, q_scale), 3)
    else:
      qz = None
    if z is None:
      src = qz if qz is not None else pz
      if sample:
        eps = jax.random.normal(self.make_rng("sample"), p_loc.shape)
        z = src.distribution.loc + src.distribution.scale * eps
      else:
        z = src.mean()
    new_d = self.merge(d, z)
    return new_d, qz, pz, z


class LadderCore(nn.Module):
  """flax trunk of the hierarchical VAE."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  hierarchy: Tuple[Dict[str, int], ...] = ()
  labels: Optional[DistributionDense] = None

  def setup(self):
    self.rungs = [BiConvLatents(filters=h["filters"],
                                kernel_size=h["kernel_size"],
                                strides=h["strides"],
                                merge_channels=h.get("channels", 64),
                                name=f"ladder_{i}")
                  for i, h in enumerate(self.hierarchy)]

  def encode(self, x, training: bool = False):
    h, hiddens = self.encoder(x, training=training, return_hidden=True)
    return self.latents(h, training=training), hiddens

  def decode(self, z, hiddens=None, training: bool = False):
    """Walk decoder layers, inserting ladder latents after their configured
    layer index.  hiddens=None -> generation (sample rungs from priors)."""
    spec = {h["decoder_layer"]: (i, h) for i, h in enumerate(self.hierarchy)}
    d = z
    dists = []
    for li, layer in enumerate(self.decoder.layers):
      d = layer(d, training=training) if isinstance(layer, nn.Module) else layer(d)
      if li in spec:
        ri, h = spec[li]
        e = hiddens[h["encoder_layer"]] if hiddens is not None else None
        d, qz_i, pz_i, z_i = self.rungs[ri](d, e)
        dists.append((qz_i, pz_i))
    return self.observation(d, training=training), dists

  def predict_labels(self, h, training: bool = False):
    return self.labels(h, training=training)

  def __call__(self, x, training: bool = False):
    qz, hiddens = self.encode(x, training=training)
    z = qz.mean()
    px, dists = self.decode(z, hiddens, training=training)
    if self.labels is not None:
      self.predict_labels(z, training=training)
    return px, qz


class HierarchicalVAE(VariationalAutoencoder):
  """Ladder VAE (Sønderby et al. 2016 / Maaløe BIVA-style bidirectional
  inference).  `free_bits` defaults to 0.25 per latent dim as the reference
  (``hierarchical_vae.py:736-905``)."""

  def __init__(self, free_bits: Optional[float] = 0.25, **kwargs):
    kwargs.setdefault("name", "hierarchicalvae")
    super().__init__(free_bits=free_bits, **kwargs)
    if not self.hierarchy:
      raise ValueError("HierarchicalVAE requires a non-empty `hierarchy` "
                       "spec (use get_networks(..., is_hierarchical=True))")

  def _build_core(self) -> nn.Module:
    return LadderCore(encoder=self.encoder_net, decoder=self.decoder_net,
                      latents=self.latents_head,
                      observation=self.observation_head,
                      hierarchy=tuple(dict(h) for h in self.hierarchy),
                      labels=self.labels_head)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz, hiddens = self._apply(params, "encode", x, rng=k1, training=training,
                              mutables=mutables)
    z = qz.sample(k2)
    px, dists = self._apply(params, "decode", z, hiddens, rng=k3,
                            training=training, mutables=mutables)
    llk = {"llk_image": px.log_prob(x)}
    kl = {"kl_latents": kl_divergence(qz, self.latents_prior,
                                      analytic=self.analytic, q_sample=z,
                                      reverse=self.reverse,
                                      free_bits=self.free_bits)}
    for i, (qz_i, pz_i) in enumerate(dists):
      kl_i = qz_i.kl_divergence(pz_i, analytic=True)
      if self.free_bits is not None:
        # free-bits per rung scaled by its event size (reference default 0.25)
        kl_i = jnp.maximum(kl_i,
                           self.free_bits * float(np.prod(qz_i.event_shape)))
      kl[f"kl_ladder{i}"] = kl_i
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, ladder=dists)

  def encode(self, x, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    qz, _ = self._apply(params, "encode", jnp.asarray(x),
                        rng=jax.random.PRNGKey(seed), training=training,
                        mutables=self.state.mutables if self.state else None)
    return qz

  def sample_observation(self, n: int = 1, seed: int = 0):
    """Ancestral sampling: top latent from the prior, rung latents from
    their conditional priors."""
    z = self.sample_prior(n, seed)
    params = self._params_of()
    px, _ = self.core.apply({"params": params["vae"]}, z, None,
                            method=self.core.decode,
                            rngs={"sample": jax.random.PRNGKey(seed),
                                  "dropout": jax.random.PRNGKey(seed)})
    return px

  def decode(self, z, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    px, _ = self.core.apply(
        {"params": params["vae"]}, jnp.asarray(z), None,
        method=self.core.decode, training=training,
        rngs={"sample": jax.random.PRNGKey(seed),
              "dropout": jax.random.PRNGKey(seed)})
    return px


LadderVAE = HierarchicalVAE


class UnetVAE(HierarchicalVAE):
  """U-Net VAE (reference ``hierarchical_vae.py:905``): ladder rungs at
  every resolution — realized by the same LadderCore with the full
  hierarchy spec (all entries enabled)."""


class PUnetVAE(HierarchicalVAE):
  """Probabilistic U-Net (reference ``hierarchical_vae.py:986``)."""


class VeryDeepVAE(HierarchicalVAE):
  """Very deep VAE (Child 2021; reference ``hierarchical_vae.py:1098``) —
  many rungs with small per-rung capacity; here the rung count equals the
  hierarchy spec length, with free_bits shared."""

  def __init__(self, free_bits: Optional[float] = 0.25, **kwargs):
    super().__init__(free_bits=free_bits, **kwargs)
