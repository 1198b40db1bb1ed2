"""Sequential VAEs: VRNN and the Disentangled Sequential Autoencoder.

Reference: ``odin/bay/vi/autoencoder/sequential_vae.py`` declares
`SequentialVAE`, `SequentialAttentionVAE`, `VariationalRNN` as docstring-only
stubs (only citations, no objective).  Implemented for real here:

- `VariationalRNN` — VRNN (Chung et al., NeurIPS 2015): per-step latent
  z_t with a learned recurrent prior ``p(z_t | h_{t-1})``, posterior
  ``q(z_t | x_t, h_{t-1})``, emission ``p(x_t | z_t, h_{t-1})``, and GRU
  recurrence ``h_t = GRU(h_{t-1}, [phi_x(x_t), phi_z(z_t)])``.
- `SequentialVAE` — Disentangled Sequential Autoencoder (Li & Mandt, ICML
  2018): a static/content latent ``f`` for the whole sequence plus dynamic
  per-step latents ``z_t`` with an autoregressive learned prior
  ``p(z_t | z_{<t})``; emission ``p(x_t | z_t, f)``.

TPU design: the only truly sequential computation — the recurrence whose
input depends on the previous step's *sample* — runs as ONE `nn.scan`
(compiled to `lax.scan`, a single XLA While with fused cell matmuls); every
time-distributed head (feature nets, emission, static posterior) is applied
vectorized over ``(B, T)`` so the MXU sees one large batched matmul instead
of T small ones.  Batches are ``(B, T, D)`` float sequences; `input_shape`
is ``(T, D)``.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)

__all__ = ["VariationalRNN", "SequentialVAE", "SequentialAttentionVAE"]


class _VRNNCell(nn.Module):
  """One VRNN step; `mode` is a static broadcast argument:

  - 'filter': x_t observed -> (qz_t, pz_t, px_t, z_t)
  - 'decode': the scanned input IS z_t; emission feeds its own mean back
    into the recurrence (closed-loop reconstruction from given latents)
  - 'generate': scanned input ignored; z_t sampled from the learned prior
  """

  zdim: int
  hidden: int
  feat_units: int
  obs_event: Tuple[int, ...]
  obs_posterior: str = "gaussian"
  latent_posterior: str = "mvndiag"

  def setup(self):
    self.feat_x = nn.Dense(self.feat_units, name="feat_x")
    self.feat_z = nn.Dense(self.feat_units, name="feat_z")
    self.post = DistributionDense(event_shape=(self.zdim,),
                                  posterior=self.latent_posterior,
                                  name="posterior")
    self.prior = DistributionDense(event_shape=(self.zdim,),
                                   posterior=self.latent_posterior,
                                   name="prior")
    self.obs = DistributionDense(event_shape=tuple(self.obs_event),
                                 posterior=self.obs_posterior,
                                 name="observation")
    self.gru = nn.GRUCell(self.hidden, name="gru")

  def __call__(self, h, inp, mode: str = "filter"):
    if mode == "filter":
      x_t = inp
      phi_x = nn.relu(self.feat_x(x_t))
      pz = self.prior(h)
      qz = self.post(jnp.concatenate([phi_x, h], -1))
      z = qz.sample(self.make_rng("sample"))
    elif mode == "decode":
      z = inp
      qz = pz = None
    elif mode == "generate":
      pz = self.prior(h)
      z = pz.sample(self.make_rng("sample"))
      qz = None
    else:
      raise ValueError(mode)
    phi_z = nn.relu(self.feat_z(z))
    px = self.obs(jnp.concatenate([phi_z, h], -1))
    if mode != "filter":
      phi_x = nn.relu(self.feat_x(
          px.mean().reshape(z.shape[:-1] + (-1,))))
    h2, _ = self.gru(h, jnp.concatenate([phi_x, phi_z], -1))
    if mode == "filter":
      return h2, (qz, pz, px, z)
    if mode == "decode":
      return h2, (px,)
    return h2, (px, z)


class VRNNCore(nn.Module):
  """Scan wrapper exposing the `VariationalAutoencoder` core surface."""

  zdim: int
  hidden: int
  feat_units: int
  obs_event: Tuple[int, ...]
  obs_posterior: str = "gaussian"
  latent_posterior: str = "mvndiag"

  def setup(self):
    scan = nn.scan(_VRNNCell, variable_broadcast="params",
                   split_rngs={"params": False, "sample": True, "dropout": True},
                   in_axes=(1, nn.broadcast), out_axes=1)
    self.cell = scan(zdim=self.zdim, hidden=self.hidden,
                     feat_units=self.feat_units, obs_event=self.obs_event,
                     obs_posterior=self.obs_posterior,
                     latent_posterior=self.latent_posterior, name="cell")

  def _h0(self, batch: int):
    return jnp.zeros((batch, self.hidden), jnp.float32)

  def elbo_scan(self, x, training: bool = False):
    _, outs = self.cell(self._h0(x.shape[0]), x, "filter")
    return outs  # (qz, pz, px, z) with time stacked on axis 1

  def encode(self, x, training: bool = False):
    qz, _, _, _ = self.elbo_scan(x, training=training)
    return qz

  def decode(self, z, training: bool = False):
    _, (px,) = self.cell(self._h0(z.shape[0]), z, "decode")
    return px

  def generate(self, dummy, training: bool = False):
    """dummy: zeros (B, T, 1) fixing the number of steps to unroll."""
    _, (px, z) = self.cell(self._h0(dummy.shape[0]), dummy, "generate")
    return px, z

  def __call__(self, x, training: bool = False):
    qz, _, px, _ = self.elbo_scan(x, training=training)
    return px, qz


class VariationalRNN(VariationalAutoencoder):
  """VRNN (Chung et al. 2015) — reference ``sequential_vae.py:39`` stub.

  Batches are (B, T, D); ``input_shape=(T, D)``.  `latents`/`observation`
  RVconfs describe ONE step's latent/emission; the recurrent prior is
  learned, so the ELBO's KL is ``sum_t KL(q(z_t|x_t,h) || p(z_t|h))``.
  """

  def __init__(self, rnn_units: int = 64, feature_units: int = 64,
               latents: Any = None, observation: Any = None,
               input_shape: Optional[Tuple[int, ...]] = None, **kwargs):
    self.rnn_units = int(rnn_units)
    self.feature_units = int(feature_units)
    if latents is None:
      latents = RVconf(16, "mvndiag", projection=True, name="latents")
    if observation is None and input_shape is not None:
      observation = RVconf((input_shape[-1],), "gaussian", projection=True,
                           name="observation")
    super().__init__(latents=latents, observation=observation,
                     input_shape=input_shape, **kwargs)

  def _build_core(self) -> nn.Module:
    obs_event = tuple(self.observation_head.event_shape)
    return VRNNCore(zdim=int(np.prod(self.latents_head.event_shape)),
                    hidden=self.rnn_units, feat_units=self.feature_units,
                    obs_event=obs_event,
                    obs_posterior=self.observation_head.posterior,
                    latent_posterior=self.latents_head.posterior)

  def decode(self, z, params=None, training=False, seed=0, jit=True):
    """z (B, T, zdim) -> px; the time axis is NOT an MCMC sample dim, so
    the base class's leading-dim flattening must not apply."""
    params = params if params is not None else self._params_of()
    z = jnp.asarray(z)
    if jit and not training:
      if not hasattr(self, "_decode_jit"):
        self._decode_jit = jax.jit(
            lambda p, zz, rng: self._apply(p, "decode", zz, rng=rng,
                                           training=False))
      return self._decode_jit(params, z, jax.random.PRNGKey(seed))
    return self._apply(params, "decode", z, rng=jax.random.PRNGKey(seed),
                       training=training,
                       mutables=self.state.mutables if self.state else None)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    qz, pz, px, z = self._apply(params, "elbo_scan", x, rng=rng,
                                training=training, mutables=mutables)
    llk = {"llk_observation": jnp.sum(px.log_prob(x), axis=-1)}
    kl_t = kl_divergence(qz, pz, analytic=self.analytic,
                         q_sample=z if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl = {"kl_latents": jnp.sum(kl_t, axis=-1)}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)

  def generate(self, n: int = 1, n_steps: Optional[int] = None,
               params=None, rng=None):
    """Unroll the learned recurrent prior into n new sequences."""
    if n_steps is None:
      n_steps = self.input_shape[0]
    params = params if params is not None else self._params_of()
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((n, n_steps, 1), jnp.float32)
    return self._apply(params, "generate", dummy, rng=rng)


class _DSAPriorCell(nn.Module):
  """Autoregressive dynamic prior ``p(z_t | z_{<t})`` of the DSA."""

  zdim: int
  hidden: int
  latent_posterior: str = "mvndiag"

  def setup(self):
    self.gru = nn.GRUCell(self.hidden, name="gru")
    self.head = DistributionDense(event_shape=(self.zdim,),
                                  posterior=self.latent_posterior,
                                  name="prior")

  def __call__(self, h, z_prev):
    h2, _ = self.gru(h, z_prev)
    return h2, self.head(h2)


class DSACore(nn.Module):
  """Disentangled Sequential Autoencoder trunk (Li & Mandt 2018).

  Static/content posterior ``q(f | x_{1:T})`` from mean-pooled per-step
  features; factorized dynamic posterior ``q(z_t | x_t, f)``; one scan for
  the learned dynamic prior; vectorized emission ``p(x_t | z_t, f)``.
  """

  zdim: int
  fdim: int
  hidden: int
  feat_units: int
  obs_event: Tuple[int, ...]
  obs_posterior: str = "gaussian"
  latent_posterior: str = "mvndiag"

  def setup(self):
    self.feat_x = nn.Dense(self.feat_units, name="feat_x")
    self.static_post = DistributionDense(event_shape=(self.fdim,),
                                         posterior=self.latent_posterior,
                                         name="static_posterior")
    self.dyn_post = DistributionDense(event_shape=(self.zdim,),
                                      posterior=self.latent_posterior,
                                      name="dynamic_posterior")
    self.obs = DistributionDense(event_shape=tuple(self.obs_event),
                                 posterior=self.obs_posterior,
                                 name="observation")
    scan = nn.scan(_DSAPriorCell, variable_broadcast="params",
                   split_rngs={"params": False, "sample": True, "dropout": True},
                   in_axes=1, out_axes=1)
    self.prior_cell = scan(zdim=self.zdim, hidden=self.hidden,
                           latent_posterior=self.latent_posterior,
                           name="dynamic_prior")

  def _features(self, x):
    return nn.relu(self.feat_x(x))  # (B, T, feat)

  def encode_static(self, x, training: bool = False):
    return self.static_post(self._features(x).mean(axis=1))

  def elbo_scan(self, x, training: bool = False):
    phi = self._features(x)  # (B, T, feat)
    qf = self.static_post(phi.mean(axis=1))
    f = qf.sample(self.make_rng("sample"))
    f_seq = jnp.broadcast_to(f[:, None, :], phi.shape[:2] + f.shape[-1:])
    qz = self.dyn_post(jnp.concatenate([phi, f_seq], -1))
    z = qz.sample(self.make_rng("sample"))
    # learned prior over the sampled dynamic path: p(z_t | z_{<t})
    z_prev = jnp.concatenate([jnp.zeros_like(z[:, :1]), z[:, :-1]], axis=1)
    h0 = jnp.zeros((x.shape[0], self.hidden), jnp.float32)
    _, pz = self.prior_cell(h0, z_prev)
    px = self.obs(jnp.concatenate([z, f_seq], -1))
    return qf, f, qz, pz, px, z

  def encode(self, x, training: bool = False):
    phi = self._features(x)
    qf = self.static_post(phi.mean(axis=1))
    f = qf.mean()
    f_seq = jnp.broadcast_to(f[:, None, :], phi.shape[:2] + f.shape[-1:])
    return self.dyn_post(jnp.concatenate([phi, f_seq], -1))

  def decode(self, z, training: bool = False, f=None):
    if f is None:
      f = jnp.zeros(z.shape[:1] + (self.fdim,), z.dtype)
    f_seq = jnp.broadcast_to(f[:, None, :], z.shape[:2] + f.shape[-1:])
    return self.obs(jnp.concatenate([z, f_seq], -1))

  def __call__(self, x, training: bool = False):
    qf, f, qz, pz, px, z = self.elbo_scan(x, training=training)
    return px, qz


class SequentialVAE(VariationalAutoencoder):
  """Disentangled Sequential Autoencoder (Li & Mandt 2018) — reference
  ``sequential_vae.py:7`` stub.  ``ELBO = sum_t llk_t - KL(f) -
  sum_t KL(z_t || p(z_t|z_<t))``; `fdim` sizes the static/content latent,
  the `latents` RVconf sizes the per-step dynamic latent."""

  def __init__(self, fdim: int = 16, rnn_units: int = 64,
               feature_units: int = 64, latents: Any = None,
               observation: Any = None,
               input_shape: Optional[Tuple[int, ...]] = None, **kwargs):
    self.fdim = int(fdim)
    self.rnn_units = int(rnn_units)
    self.feature_units = int(feature_units)
    if latents is None:
      latents = RVconf(8, "mvndiag", projection=True, name="latents")
    if observation is None and input_shape is not None:
      observation = RVconf((input_shape[-1],), "gaussian", projection=True,
                           name="observation")
    super().__init__(latents=latents, observation=observation,
                     input_shape=input_shape, **kwargs)
    # eager prior for the static latent (never built inside a trace)
    self._priors["static"] = RVconf(self.fdim, "mvndiag").create_prior()

  def _build_core(self) -> nn.Module:
    return DSACore(zdim=int(np.prod(self.latents_head.event_shape)),
                   fdim=self.fdim, hidden=self.rnn_units,
                   feat_units=self.feature_units,
                   obs_event=tuple(self.observation_head.event_shape),
                   obs_posterior=self.observation_head.posterior,
                   latent_posterior=self.latents_head.posterior)

  # the time axis is not an MCMC dim: reuse VariationalRNN's decode override
  decode = VariationalRNN.decode

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    qf, f, qz, pz, px, z = self._apply(params, "elbo_scan", x, rng=rng,
                                       training=training, mutables=mutables)
    llk = {"llk_observation": jnp.sum(px.log_prob(x), axis=-1)}
    kl_f = kl_divergence(qf, self._priors["static"], analytic=self.analytic,
                         q_sample=f if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl_t = kl_divergence(qz, pz, analytic=self.analytic,
                         q_sample=z if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl = {"kl_static": kl_f, "kl_dynamic": jnp.sum(kl_t, axis=-1)}
    return llk, kl, dict(qz=qz, qf=qf, px=px, z=z, x=x, y=y)


class _VarAttnCell(nn.Module):
  """One decode step of the variational-attention seq2seq autoencoder.

  Deterministic dot-product attention over the encoder states gives the
  context MEAN; the context itself is a Gaussian latent (Bahuleyan et al.
  2017: ``q(c_t | x) = N(c_bar_t, sigma(h_t))`` with prior N(0, I)), so
  attention weights carry an information cost instead of leaking the whole
  input for free.
  """

  hidden: int
  obs_event: Tuple[int, ...]
  obs_posterior: str = "gaussian"
  attn_score: str = "dot"
  attn_position: str = "global"
  attn_align: str = "soft"
  attn_window: int = 8

  def setup(self):
    from odin_tpu.networks.attention import Attention
    self.query = nn.Dense(self.hidden, name="query")
    self.log_scale = nn.Dense(self.hidden, name="context_log_scale")
    self.obs = DistributionDense(event_shape=tuple(self.obs_event),
                                 posterior=self.obs_posterior,
                                 name="observation")
    self.gru = nn.GRUCell(self.hidden, name="gru")
    self.attn = Attention(score=self.attn_score,
                          position=self.attn_position,
                          align=self.attn_align,
                          window=self.attn_window, name="attn")

  def __call__(self, h, x_prev, states, z):
    # states: (B, T, H) broadcast; x_prev: (B, D) teacher-forced input
    q = self.query(jnp.concatenate([h, z], -1))  # (B, H)
    ctx, _ = self.attn(q[:, None], states)       # full algebra (score x
    c_mean = ctx[:, 0]                           # position x align modes)
    c_scale = jax.nn.softplus(self.log_scale(h)) + 1e-4
    from odin_tpu.bay.distributions.continuous import MultivariateNormalDiag
    qc = MultivariateNormalDiag(c_mean, c_scale)
    c = qc.sample(self.make_rng("sample"))
    px = self.obs(jnp.concatenate([h, c, z], -1))
    h2, _ = self.gru(h, jnp.concatenate([x_prev, c], -1))
    return h2, (px, qc, c)


class SAVAECore(nn.Module):
  """Encoder GRU -> states; global latent z; variational-attention decoder."""

  zdim: int
  hidden: int
  obs_event: Tuple[int, ...]
  obs_posterior: str = "gaussian"
  latent_posterior: str = "mvndiag"
  decode_steps: int = 1
  attn_score: str = "dot"
  attn_position: str = "global"
  attn_align: str = "soft"
  attn_window: int = 8

  def setup(self):
    enc_scan = nn.scan(nn.GRUCell, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
    self.enc_rnn = enc_scan(self.hidden, name="encoder_rnn")
    self.z_head = DistributionDense(event_shape=(self.zdim,),
                                    posterior=self.latent_posterior,
                                    name="latents")
    dec_scan = nn.scan(
        _VarAttnCell, variable_broadcast="params",
        split_rngs={"params": False, "sample": True, "dropout": True},
        in_axes=(1, nn.broadcast, nn.broadcast), out_axes=1)
    self.dec = dec_scan(hidden=self.hidden, obs_event=self.obs_event,
                        obs_posterior=self.obs_posterior,
                        attn_score=self.attn_score,
                        attn_position=self.attn_position,
                        attn_align=self.attn_align,
                        attn_window=self.attn_window, name="decoder")

  def _states(self, x):
    h0 = jnp.zeros((x.shape[0], self.hidden), jnp.float32)
    _, states = self.enc_rnn(h0, x)
    return states  # (B, T, H)

  def encode(self, x, training: bool = False):
    return self.z_head(self._states(x)[:, -1])

  def elbo_scan(self, x, training: bool = False):
    states = self._states(x)
    qz = self.z_head(states[:, -1])
    z = qz.sample(self.make_rng("sample"))
    # teacher forcing: decode step t sees x_{t-1}
    x_prev = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    h0 = jnp.zeros((x.shape[0], self.hidden), jnp.float32)
    _, (px, qc, c) = self.dec(h0, x_prev, states, z)
    return qz, z, qc, c, px

  def decode(self, z, training: bool = False, n_steps: Optional[int] = None):
    """Free-running decode from a global latent only: the attention memory
    is the latent itself broadcast to one slot (no encoder states).  The
    number of emitted steps is `n_steps`, defaulting to the sequence length
    fixed at construction (`decode_steps`) — flax modules are frozen, so
    this cannot be a mutable attribute (ADVICE r1)."""
    B = z.shape[0]
    states = jnp.zeros((B, 1, self.hidden), jnp.float32)
    T = int(n_steps) if n_steps is not None else self.decode_steps
    x_prev = jnp.zeros((B, T) + tuple(self.obs_event), jnp.float32)
    h0 = jnp.zeros((B, self.hidden), jnp.float32)
    _, (px, _, _) = self.dec(h0, x_prev, states, z)
    return px

  def __call__(self, x, training: bool = False):
    qz, z, qc, c, px = self.elbo_scan(x, training=training)
    return px, qz


class SequentialAttentionVAE(VariationalAutoencoder):
  """Latent/variational attention seq2seq autoencoder — reference
  ``sequential_vae.py:25`` stub (Deng et al. 2018; Bahuleyan et al. 2017),
  implemented: global latent z + per-step Gaussian attention contexts c_t
  with N(0, I) prior; ``ELBO = sum_t llk_t - KL(z) - attn_beta * sum_t
  KL(c_t)``."""

  def __init__(self, rnn_units: int = 64, attn_beta: float = 0.1,
               latents: Any = None, observation: Any = None,
               input_shape: Optional[Tuple[int, ...]] = None,
               attn_score: str = "dot", attn_position: str = "global",
               attn_align: str = "soft", attn_window: int = 8, **kwargs):
    self.rnn_units = int(rnn_units)
    self.attn_beta = float(attn_beta)
    self.attn_score = str(attn_score)
    self.attn_position = str(attn_position)
    self.attn_align = str(attn_align)
    self.attn_window = int(attn_window)
    if latents is None:
      latents = RVconf(16, "mvndiag", projection=True, name="latents")
    if observation is None and input_shape is not None:
      observation = RVconf((input_shape[-1],), "gaussian", projection=True,
                           name="observation")
    super().__init__(latents=latents, observation=observation,
                     input_shape=input_shape, **kwargs)
    self._priors["context"] = RVconf(self.rnn_units, "mvndiag").create_prior()

  def _build_core(self) -> nn.Module:
    return SAVAECore(zdim=int(np.prod(self.latents_head.event_shape)),
                     hidden=self.rnn_units,
                     obs_event=tuple(self.observation_head.event_shape),
                     obs_posterior=self.observation_head.posterior,
                     latent_posterior=self.latents_head.posterior,
                     decode_steps=(int(self.input_shape[0])
                                   if self.input_shape else 1),
                     attn_score=self.attn_score,
                     attn_position=self.attn_position,
                     attn_align=self.attn_align,
                     attn_window=self.attn_window)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    qz, z, qc, c, px = self._apply(params, "elbo_scan", x, rng=rng,
                                   training=training, mutables=mutables)
    llk = {"llk_observation": jnp.sum(px.log_prob(x), axis=-1)}
    kl_z = kl_divergence(qz, self.latents_prior, analytic=self.analytic,
                         q_sample=z if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl_c = kl_divergence(qc, self._priors["context"], analytic=self.analytic,
                         q_sample=c if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    kl = {"kl_latents": kl_z,
          "kl_attention": self.attn_beta * jnp.sum(kl_c, axis=-1)}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)
