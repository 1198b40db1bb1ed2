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
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)
from odin_tpu.training.core import TrainStep

__all__ = ["BiConvLatents", "BiDenseLatents", "ParallelLatents",
           "LadderCore", "HierarchicalVAE", "LadderVAE",
           "UnetCore", "UnetVAE", "PUnetCore", "PUnetVAE", "VeryDeepVAE"]


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


class BiDenseLatents(nn.Module):
  """Dense ladder rung (reference `BiDenseLatents`,
  ``hierarchical_vae.py:617``): same bidirectional-inference protocol as
  `BiConvLatents` with Dense parameter heads — for rungs sitting on
  flattened decoder states."""

  units: int = 16
  merge_units: int = 64

  def setup(self):
    self.prior_dense = nn.Dense(2 * self.units)
    self.post_dense_d = nn.Dense(2 * self.units)
    self.post_dense_e = nn.Dense(2 * self.units)
    self.merge_dense = nn.Dense(self.merge_units)

  def _flat(self, h):
    return h.reshape(h.shape[0], -1)

  def prior_params(self, d):
    loc, raw = jnp.split(self.prior_dense(self._flat(d)), 2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def posterior_params(self, d, e):
    loc, raw = jnp.split(
        self.post_dense_d(self._flat(d)) + self.post_dense_e(self._flat(e)),
        2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def merge(self, d, z):
    up = self.merge_dense(z)
    if d.ndim > 2:  # broadcast a dense rung back onto a spatial state
      up = up.reshape(up.shape[0], *([1] * (d.ndim - 2)), -1)
      up = jnp.broadcast_to(up[..., :d.shape[-1]],
                            d.shape) if up.shape[-1] >= d.shape[-1] else \
          jnp.broadcast_to(jnp.pad(up, [(0, 0)] * (up.ndim - 1) +
                                   [(0, d.shape[-1] - up.shape[-1])]), d.shape)
      return d + up
    return d + up[..., :d.shape[-1]]

  def __call__(self, d, e=None, z=None, sample: bool = True):
    p_loc, p_scale = self.prior_params(d)
    pz = Independent(Normal(p_loc, p_scale), 1)
    if e is not None:
      q_loc, q_scale = self.posterior_params(d, e)
      qz = Independent(Normal(q_loc, q_scale), 1)
    else:
      qz = None
    if z is None:
      src = qz if qz is not None else pz
      if sample:
        eps = jax.random.normal(self.make_rng("sample"), p_loc.shape)
        z = src.distribution.loc + src.distribution.scale * eps
      else:
        z = src.mean()
    return self.merge(d, z), qz, pz, z


class ParallelLatents(nn.Module):
  """Parallel latent group (reference `ParallelLatents`,
  ``hierarchical_vae.py:617-736``, Zhao et al. 2017 'Learning Hierarchical
  Features from Generative Models'): the posterior q(z_i | x) reads ONLY
  the encoder state — every group infers in parallel from the data instead
  of bidirectionally through the decoder — while the prior p(z_i | z_>i)
  still conditions on the decoder state; `residual_coef` scales the
  decoder shortcut at the merge (information takes the shortest path, so
  keep rung units <= z0 — reference docstring)."""

  filters: int = 16
  kernel_size: int = 8
  strides: int = 4
  merge_channels: int = 64
  residual_coef: float = 1.0

  def setup(self):
    k = (self.kernel_size, self.kernel_size)
    s = (self.strides, self.strides)
    self.prior_conv = nn.Conv(2 * self.filters, k, strides=s, padding="SAME")
    self.post_conv_e = nn.Conv(2 * self.filters, k, strides=s, padding="SAME")
    self.merge_deconv = nn.ConvTranspose(self.merge_channels, k, strides=s,
                                         padding="SAME")

  def prior_params(self, d):
    loc, raw = jnp.split(self.prior_conv(d), 2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def posterior_params(self, e):
    loc, raw = jnp.split(self.post_conv_e(e), 2, axis=-1)
    return loc, jax.nn.softplus(raw) + 1e-5

  def __call__(self, d, e=None, z=None, sample: bool = True):
    p_loc, p_scale = self.prior_params(d)
    pz = Independent(Normal(p_loc, p_scale), 3)
    if e is not None:
      q_loc, q_scale = self.posterior_params(e)
      # posterior grid may differ from the prior's when encoder/decoder
      # states disagree spatially; crop to the prior's grid
      q_loc = q_loc[:, :p_loc.shape[1], :p_loc.shape[2], :]
      q_scale = q_scale[:, :p_loc.shape[1], :p_loc.shape[2], :]
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
    up = self.merge_deconv(z)[:, :d.shape[1], :d.shape[2], :]
    return self.residual_coef * d + up, qz, pz, z


def _make_rung(i: int, h: Dict[str, Any]) -> nn.Module:
  kind = str(h.get("latents", "biconv")).lower()
  if kind in ("bidense", "dense"):
    return BiDenseLatents(units=h.get("filters", 16),
                          merge_units=h.get("channels", 64),
                          name=f"ladder_{i}")
  if kind in ("parallel",):
    return ParallelLatents(filters=h["filters"],
                           kernel_size=h["kernel_size"],
                           strides=h["strides"],
                           merge_channels=h.get("channels", 64),
                           residual_coef=float(h.get("residual_coef", 1.0)),
                           name=f"ladder_{i}")
  return BiConvLatents(filters=h["filters"],
                       kernel_size=h["kernel_size"],
                       strides=h["strides"],
                       merge_channels=h.get("channels", 64),
                       name=f"ladder_{i}")


class LadderCore(nn.Module):
  """flax trunk of the hierarchical VAE."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  hierarchy: Tuple[Dict[str, int], ...] = ()
  labels: Optional[DistributionDense] = None

  def setup(self):
    self.rungs = [_make_rung(i, h) for i, h in enumerate(self.hierarchy)]

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

  def reconstruct(self, x, params=None, seed: int = 0):
    """x -> (qz, px) through the POSTERIOR path: rung latents are inferred
    from the paired encoder states, matching the training objective.  The
    plain `decode` (hiddens=None) is generation mode — evaluating
    reconstructions through it discards the ladder posteriors and reports
    catastrophically wrong llk (round-1 ladder 'ELBO -3251' diagnosis)."""
    params = params or self._params_of()
    if not hasattr(self, "_reconstruct_jit"):
      def _fn(p, x, rng):
        qz, hiddens = self._apply(p, "encode", x, rng=rng, training=False)
        px, _ = self._apply(p, "decode", qz.mean(), hiddens, rng=rng,
                            training=False)
        return qz, px
      self._reconstruct_jit = jax.jit(_fn)
    return self._reconstruct_jit(params, jnp.asarray(x),
                                 jax.random.PRNGKey(seed))

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


class UnetCore(nn.Module):
  """U-Net trunk: deterministic encoder->decoder skip additions at matched
  resolutions (reference `UnetVAE.encode/decode`,
  ``hierarchical_vae.py:905-984``: ``h_d = h_d + h_e`` per layers_map,
  optional dropout/noise on the skip)."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  hierarchy: Tuple[Dict[str, int], ...] = ()
  skip_dropout: float = 0.0
  skip_noise: float = 0.0
  skip_sample_dropout: float = 0.0
  labels: Optional[DistributionDense] = None

  def setup(self):
    # 1x1 conv aligns encoder channels with the decoder state where they
    # differ (the reference requires hand-matched layer shapes instead)
    self.skip_projs = [
        nn.Conv(h.get("channels", 64), (1, 1), name=f"skip_{i}")
        for i, h in enumerate(self.hierarchy)
    ]

  def encode(self, x, training: bool = False):
    h, hiddens = self.encoder(x, training=training, return_hidden=True)
    return self.latents(h, training=training), hiddens

  def decode(self, z, hiddens=None, training: bool = False):
    spec = {h["decoder_layer"]: (i, h) for i, h in enumerate(self.hierarchy)}
    d = z
    # per-SAMPLE whole-path gate, one draw shared by every rung: with prob
    # `skip_sample_dropout` a sample sees NO skips at all, so the decoder
    # must remain a full generative model of x from z alone — per-unit
    # dropout is too weak (measured: llk still -> 0 through half-dropped
    # skips on dSprites, results/hierarchical).  No rescaling: the gated
    # mode IS the generation mode, exactly the no-skip decode path.
    gate = None
    if self.skip_sample_dropout > 0 and training and hiddens is not None:
      B = z.shape[0]
      gate = jax.random.bernoulli(
          self.make_rng("dropout"), 1.0 - self.skip_sample_dropout,
          (B, 1, 1, 1)).astype(z.dtype)
    for li, layer in enumerate(self.decoder.layers):
      d = layer(d, training=training) if isinstance(layer, nn.Module) \
          else layer(d)
      if li in spec and hiddens is not None:
        ri, h = spec[li]
        e = hiddens[h["encoder_layer"]]
        e = self.skip_projs[ri](e)
        # center-crop to the decoder state's spatial dims if they disagree
        e = e[:, :d.shape[1], :d.shape[2], :]
        if self.skip_dropout > 0 and training:
          keep = jax.random.bernoulli(self.make_rng("dropout"),
                                      1.0 - self.skip_dropout, e.shape)
          e = e * keep / (1.0 - self.skip_dropout)
        if self.skip_noise > 0 and training:
          e = e + self.skip_noise * jax.random.normal(self.make_rng("sample"),
                                                      e.shape)
        if gate is not None:
          e = e * gate
        d = d + e
    return self.observation(d, training=training), ()

  def predict_labels(self, h, training: bool = False):
    return self.labels(h, training=training)

  def __call__(self, x, training: bool = False):
    qz, hiddens = self.encode(x, training=training)
    px, _ = self.decode(qz.mean(), hiddens, training=training)
    if self.labels is not None:
      self.predict_labels(qz.mean(), training=training)
    return px, qz


class UnetVAE(BetaVAE):
  """U-Net VAE (reference ``hierarchical_vae.py:905``): deterministic skip
  connections from encoder to decoder states at each configured resolution;
  a single stochastic bottleneck (NOT hierarchical — reference
  ``is_hierarchical() -> False``), beta=10, free_bits=2 defaults."""

  def __init__(self, beta: float = 10.0, free_bits: Optional[float] = 2.0,
               skip_dropout: float = 0.0, skip_noise: float = 0.0,
               skip_sample_dropout: float = 0.0,
               **kwargs):
    self.skip_dropout = float(skip_dropout)
    self.skip_noise = float(skip_noise)
    self.skip_sample_dropout = float(skip_sample_dropout)
    kwargs.setdefault("name", "unetvae")
    super().__init__(beta=beta, free_bits=free_bits, **kwargs)
    if not self.hierarchy:
      raise ValueError("UnetVAE requires a `hierarchy` spec for its skip "
                       "map (use get_networks(..., is_hierarchical=True))")

  def _build_core(self) -> nn.Module:
    return UnetCore(encoder=self.encoder_net, decoder=self.decoder_net,
                    latents=self.latents_head,
                    observation=self.observation_head,
                    hierarchy=tuple(dict(h) for h in self.hierarchy),
                    skip_dropout=self.skip_dropout,
                    skip_noise=self.skip_noise,
                    skip_sample_dropout=self.skip_sample_dropout,
                    labels=self.labels_head)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz, hiddens = self._apply(params, "encode", x, rng=k1, training=training,
                              mutables=mutables)
    z = qz.sample(k2)
    px, _ = self._apply(params, "decode", z, hiddens, rng=k3,
                        training=training, mutables=mutables)
    beta = self._schedule(self.beta, step)
    llk = {"llk_image": px.log_prob(x)}
    kl = {"kl_latents": beta * kl_divergence(
        qz, self.latents_prior, analytic=self.analytic, q_sample=z,
        reverse=self.reverse, free_bits=self.free_bits)}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)

  def encode(self, x, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    qz, _ = self._apply(params, "encode", jnp.asarray(x),
                        rng=jax.random.PRNGKey(seed), training=training,
                        mutables=self.state.mutables if self.state else None)
    return qz

  def decode(self, z, params=None, training: bool = False, seed: int = 0):
    """Generation-mode decode (no skips — the skip inputs require x)."""
    params = params or self._params_of()
    px, _ = self._apply(params, "decode", jnp.asarray(z), None,
                        rng=jax.random.PRNGKey(seed), training=training,
                        mutables=self.state.mutables if self.state else None)
    return px

  def reconstruct(self, x, params=None, seed: int = 0):
    """Posterior path: decode WITH the encoder skip states."""
    params = params or self._params_of()
    if not hasattr(self, "_reconstruct_jit"):
      def _fn(p, x, rng):
        qz, hiddens = self._apply(p, "encode", x, rng=rng, training=False)
        px, _ = self._apply(p, "decode", qz.mean(), hiddens, rng=rng,
                            training=False)
        return qz, px
      self._reconstruct_jit = jax.jit(_fn)
    return self._reconstruct_jit(params, jnp.asarray(x),
                                 jax.random.PRNGKey(seed))


class PUnetCore(nn.Module):
  """Probabilistic U-Net trunk (reference `PUnetVAE`,
  ``hierarchical_vae.py:986-1096``): per-resolution ladder posteriors
  q_i(z_i | encoder state) and priors p_i(z_i | decoder state), realized as
  Dense mvndiag heads on the flattened states.  'Soft connection': the
  ladder samples do NOT feed the decoder — they only regularize via
  KL(q_i || p_i) (the reference's documented design choice)."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  hierarchy: Tuple[Dict[str, int], ...] = ()
  ladder_units: int = 16
  labels: Optional[DistributionDense] = None

  def setup(self):
    u = self.ladder_units
    self.q_heads = [nn.Dense(2 * u, name=f"ladder_q{i}")
                    for i in range(len(self.hierarchy))]
    self.p_heads = [nn.Dense(2 * u, name=f"ladder_p{i}")
                    for i in range(len(self.hierarchy))]

  @staticmethod
  def _mvndiag(params):
    loc, raw = jnp.split(params, 2, axis=-1)
    return Independent(Normal(loc, jax.nn.softplus(raw) + 1e-5), 1)

  def encode(self, x, training: bool = False):
    h, hiddens = self.encoder(x, training=training, return_hidden=True)
    Q = []
    for i, spec in enumerate(self.hierarchy):
      e = hiddens[spec["encoder_layer"]]
      Q.append(self._mvndiag(self.q_heads[i](e.reshape(e.shape[0], -1))))
    return self.latents(h, training=training), tuple(Q)

  def decode(self, z, training: bool = False):
    spec = {h["decoder_layer"]: i for i, h in enumerate(self.hierarchy)}
    d = z
    P = [None] * len(self.hierarchy)
    for li, layer in enumerate(self.decoder.layers):
      d = layer(d, training=training) if isinstance(layer, nn.Module) \
          else layer(d)
      if li in spec:
        i = spec[li]
        P[i] = self._mvndiag(self.p_heads[i](d.reshape(d.shape[0], -1)))
    return self.observation(d, training=training), tuple(P)

  def predict_labels(self, h, training: bool = False):
    return self.labels(h, training=training)

  def __call__(self, x, training: bool = False):
    qz, Q = self.encode(x, training=training)
    px, P = self.decode(qz.mean(), training=training)
    if self.labels is not None:
      self.predict_labels(qz.mean(), training=training)
    return px, qz


class PUnetVAE(BetaVAE):
  """Probabilistic U-Net VAE (reference ``hierarchical_vae.py:986``)."""

  def __init__(self, beta: float = 10.0, free_bits: Optional[float] = 2.0,
               ladder_units: int = 16, **kwargs):
    self.ladder_units = int(ladder_units)
    kwargs.setdefault("name", "punetvae")
    super().__init__(beta=beta, free_bits=free_bits, **kwargs)
    if not self.hierarchy:
      raise ValueError("PUnetVAE requires a `hierarchy` spec for its ladder "
                       "map (use get_networks(..., is_hierarchical=True))")

  def _build_core(self) -> nn.Module:
    return PUnetCore(encoder=self.encoder_net, decoder=self.decoder_net,
                     latents=self.latents_head,
                     observation=self.observation_head,
                     hierarchy=tuple(dict(h) for h in self.hierarchy),
                     ladder_units=self.ladder_units,
                     labels=self.labels_head)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    (qz, Q) = self._apply(params, "encode", x, rng=k1, training=training,
                          mutables=mutables)
    z = qz.sample(k2)
    px, P = self._apply(params, "decode", z, rng=k3, training=training,
                        mutables=mutables)
    beta = self._schedule(self.beta, step)
    llk = {"llk_image": px.log_prob(x)}
    kl = {"kl_latents": beta * kl_divergence(
        qz, self.latents_prior, analytic=self.analytic, q_sample=z,
        reverse=self.reverse, free_bits=self.free_bits)}
    for i, (qz_i, pz_i) in enumerate(zip(Q, P)):
      kl_i = qz_i.kl_divergence(pz_i, analytic=True)
      if self.free_bits is not None:
        kl_i = jnp.maximum(kl_i,
                           self.free_bits * float(np.prod(qz_i.event_shape)))
      kl[f"kl_ladder{i}"] = beta * kl_i
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, ladder=tuple(zip(Q, P)))

  def encode(self, x, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    qz, _ = self._apply(params, "encode", jnp.asarray(x),
                        rng=jax.random.PRNGKey(seed), training=training,
                        mutables=self.state.mutables if self.state else None)
    return qz

  def decode(self, z, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    px, _ = self._apply(params, "decode", jnp.asarray(z),
                        rng=jax.random.PRNGKey(seed), training=training,
                        mutables=self.state.mutables if self.state else None)
    return px


class VeryDeepVAE(HierarchicalVAE):
  """Very deep VAE (Child 2021; reference ``hierarchical_vae.py:1098``
  inherits AnnealingVAE — a declared-but-TODO class there).  Realized as the
  ladder with the KL warm-up the reference's citations prescribe (Sønderby
  2016): every KL term is scaled by a schedule annealing 1e-6 -> 1 over
  `warmup_steps`."""

  def __init__(self, free_bits: Optional[float] = 0.25,
               warmup_steps: int = 2000, **kwargs):
    from odin_tpu.backend.interpolation import linear
    self._kl_schedule = linear(vmin=1e-6, vmax=1.0, steps=int(warmup_steps))
    kwargs.setdefault("name", "verydeepvae")
    super().__init__(free_bits=free_bits, **kwargs)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    llk, kl, aux = super().elbo_components(params, batch, rng, step,
                                           training=training,
                                           mutables=mutables)
    w = self._kl_schedule(step)
    kl = {k: w * v for k, v in kl.items()}
    return llk, kl, aux
