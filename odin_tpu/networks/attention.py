"""Attention layers.

Reference: ``odin/networks/attention_mechanism.py:92-595`` (`AttentionMechanism`
IntFlag algebra: {dot, additive, cosine, general, location} scoring x
{global, local-m, local-p} positioning x {soft, relaxed, hard} alignment x
self/cross) and ``odin/networks/attention.py:22-276`` (`Attention`,
`SelfAttention`, `GlobalAttention`, `LocalPredictiveAttention`).

TPU redesign: the flag algebra becomes explicit fields of one `Attention`
module — every combination is a static jit specialization (no Python
branching inside the trace):

* ``score``: 'dot' | 'additive' | 'cosine' | 'general' | 'location'
* ``position``: 'global' | 'local_m' (monotonic: attend the trailing
  window of the keys, reference `PosLocalM`) | 'local_p' (predictive:
  a learned position picks a Gaussian window, Luong et al. 2015 Eq. 10,
  reference `PosLocalP`)
* ``align``: 'soft' | 'relaxed' (Gumbel-softmax sample at `temperature`,
  reference `AlignRelax`) | 'hard' (one-hot categorical sample, reference
  `AlignHard`) with ``estimator``: 'st' (straight-through) or 'reinforce'
  (DiCE magic-box surrogate — unbiased score-function gradients through
  any downstream loss)
"""
from __future__ import annotations

from enum import IntFlag, auto
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AttentionMechanism", "Attention", "SelfAttention",
           "GlobalAttention", "LocalPredictiveAttention",
           "MultiHeadAttention", "AttentionHeads", "create_attention_heads"]


class AttentionMechanism(IntFlag):
  """Flag set kept for API parity (reference ``attention_mechanism.py:92``)."""

  ScoreDot = auto()
  ScoreAdditive = auto()
  ScoreLocation = auto()
  ScoreGeneral = auto()
  ScoreCosine = auto()
  Global = auto()
  LocalM = auto()
  LocalP = auto()
  Self = auto()
  Cross = auto()
  Soft = auto()
  Relax = auto()
  Hard = auto()

  def to_fields(self) -> dict:
    """Flags -> `Attention` module fields (the TPU-native spelling of the
    reference's flag algebra)."""
    M = AttentionMechanism
    score = ("additive" if M.ScoreAdditive in self else
             "location" if M.ScoreLocation in self else
             "general" if M.ScoreGeneral in self else
             "cosine" if M.ScoreCosine in self else "dot")
    position = ("local_m" if M.LocalM in self else
                "local_p" if M.LocalP in self else "global")
    align = ("hard" if M.Hard in self else
             "relaxed" if M.Relax in self else "soft")
    return dict(score=score, position=position, align=align)


class Attention(nn.Module):
  """Attention over (query, key, value) with the full reference algebra.

  __call__(q, k=None, v=None) with k/v defaulting to q (self-attention).
  Returns (context, weights); for 'hard'/'relaxed' alignment `weights` is
  the (differentiable-surrogate) sample.  Sampling alignments draw from the
  'sample' rng stream.
  """

  units: Optional[int] = None
  score: str = "dot"          # dot | additive | cosine | general | location
  position: str = "global"    # global | local_m | local_p
  align: str = "soft"         # soft | relaxed | hard
  estimator: str = "st"       # st | reinforce (hard alignment only)
  window: int = 8             # local_m/local_p window width (frames)
  causal: bool = False
  temperature: float = 1.0
  n_mcmc: int = 1             # kept for reference sample_shape parity

  def _logits(self, q, k, d):
    """Score every query step against every key step -> (B, Tq, Tv)."""
    if self.score == "dot":
      return jnp.einsum("btd,bsd->bts", q, k) / np.sqrt(d)
    if self.score == "general":
      # reference ScoreGeneral: project q to key dim, then dot
      qg = nn.Dense(k.shape[-1], name="general_proj")(q)
      return jnp.einsum("btd,bsd->bts", qg, k) / np.sqrt(k.shape[-1])
    if self.score == "cosine":
      qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
      kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-9)
      return jnp.einsum("btd,bsd->bts", qn, kn)
    if self.score == "additive":
      w = nn.Dense(d, name="w_add")
      u = nn.Dense(d, name="u_add")
      vvec = self.param("v_add", nn.initializers.normal(0.02), (d,))
      return jnp.einsum(
          "btsd,d->bts", jnp.tanh(w(q)[:, :, None, :] + u(k)[:, None, :, :]),
          vvec)
    if self.score == "location":
      return jnp.broadcast_to(nn.Dense(1, name="loc")(q),
                              q.shape[:2] + (k.shape[1],))
    raise ValueError(f"unknown score '{self.score}'")

  @nn.compact
  def __call__(self, q, k=None, v=None, mask=None, training: bool = False):
    k = q if k is None else k
    v = k if v is None else v
    d = self.units or q.shape[-1]
    if self.units is not None:
      q = nn.Dense(d, name="q_proj")(q)
      k = nn.Dense(d, name="k_proj")(k)
    # -- positioning ---------------------------------------------------------
    gauss = None
    if self.position == "local_m":
      # monotonic local attention: the trailing `window` keys (reference
      # `key = key[:, -window_width:]`)
      w = min(self.window, k.shape[1])
      k, v = k[:, -w:], v[:, -w:]
      if mask is not None:
        mask = mask[..., -w:]
    elif self.position == "local_p":
      # predictive local attention: sigmoid position predictor from the
      # whole query step, Gaussian window of width `window` (Luong Eq. 10)
      S = k.shape[1]
      p = jax.nn.sigmoid(
          nn.Dense(1, name="position")(jnp.tanh(nn.Dense(
              d, name="pos_hidden")(q))))[..., 0] * S      # (B, Tq)
      positions = jnp.arange(S)[None, None, :]
      gauss = jnp.exp(-0.5 * ((positions - p[..., None]) /
                              (self.window / 2.0)) ** 2)   # (B, Tq, S)
    elif self.position != "global":
      raise ValueError(f"unknown position '{self.position}'")
    # -- scoring -------------------------------------------------------------
    logits = self._logits(q, k, d)
    if gauss is not None:
      # reference applies the window to the raw scores pre-softmax
      logits = logits + jnp.log(jnp.maximum(gauss, 1e-20))
    if self.causal:
      t, s = logits.shape[-2], logits.shape[-1]
      causal = np.tril(np.ones((t, s), bool), k=s - t)
      logits = jnp.where(causal[None], logits, -1e30)
    if mask is not None:
      logits = jnp.where(mask.astype(bool), logits, -1e30)
    # -- alignment -----------------------------------------------------------
    soft = jax.nn.softmax(logits / self.temperature, axis=-1)
    if self.align == "soft":
      weights = soft
    elif self.align == "relaxed":
      # Gumbel-softmax (reference RelaxedOneHotCategorical): reparameterized,
      # gradients flow through the relaxed sample
      g = -jnp.log(-jnp.log(jax.random.uniform(
          self.make_rng("sample"), logits.shape, minval=1e-20, maxval=1.0)))
      weights = jax.nn.softmax((logits + g) / self.temperature, axis=-1)
    elif self.align == "hard":
      idx = jax.random.categorical(self.make_rng("sample"), logits, axis=-1)
      onehot = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
      if self.estimator == "st":
        # straight-through: forward one-hot, backward softmax
        weights = onehot + soft - jax.lax.stop_gradient(soft)
      elif self.estimator == "reinforce":
        # DiCE magic-box: value == one-hot sample, gradient == REINFORCE
        # score-function  d/dθ E[f] = E[f · ∇log p]  for ANY downstream f
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), idx[..., None],
            axis=-1)                                        # (B, Tq, 1)
        magic = jnp.exp(logp - jax.lax.stop_gradient(logp))
        weights = jax.lax.stop_gradient(onehot) * magic
      else:
        raise ValueError(f"unknown estimator '{self.estimator}'")
    else:
      raise ValueError(f"unknown align '{self.align}'")
    context = jnp.einsum("bts,bsd->btd", weights, v)
    return context, weights


class SelfAttention(nn.Module):
  """Reference ``attention.py:22``."""

  units: Optional[int] = None
  score: str = "dot"
  causal: bool = False

  @nn.compact
  def __call__(self, x, mask=None, training: bool = False):
    ctx, w = Attention(units=self.units, score=self.score,
                       causal=self.causal, name="attn")(x, training=training)
    return ctx


class GlobalAttention(nn.Module):
  """Full-window cross attention (reference ``attention.py``)."""

  units: Optional[int] = None
  score: str = "dot"

  @nn.compact
  def __call__(self, q, k, v=None, mask=None, training: bool = False):
    ctx, _ = Attention(units=self.units, score=self.score,
                       name="attn")(q, k, v, mask=mask, training=training)
    return ctx


class LocalPredictiveAttention(nn.Module):
  """Local-p attention (Luong et al.): a learned position predictor centers
  a Gaussian window over the keys (reference local-p mode).  Thin wrapper
  over `Attention(position='local_p')`."""

  units: Optional[int] = None
  window: int = 8

  @nn.compact
  def __call__(self, q, k, v=None, training: bool = False):
    ctx, _ = Attention(units=self.units, position="local_p",
                       window=self.window, name="attn")(q, k, v,
                                                        training=training)
    return ctx


class MultiHeadAttention(nn.Module):
  """Standard multi-head attention (thin wrapper over flax for
  completeness).  With ``flash=True`` the unmasked soft path runs the
  Pallas tiled online-softmax kernel (`ops/pallas_attention.py`) instead of
  materializing the (Tq, Tk) score matrix — the TPU-native replacement for
  the reference's explicit einsum attention at long sequence lengths."""

  num_heads: int = 4
  qkv_features: Optional[int] = None
  flash: bool = False

  @nn.compact
  def __call__(self, q, k=None, v=None, mask=None, training: bool = False):
    k = q if k is None else k
    v = k if v is None else v
    attention_fn = None
    if self.flash:
      from odin_tpu.ops.pallas_attention import flash_attention_fn
      attention_fn = flash_attention_fn
    kwargs = {} if attention_fn is None else {"attention_fn": attention_fn}
    return nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, qkv_features=self.qkv_features,
        deterministic=not training, **kwargs)(q, k, v, mask=mask)


class AttentionHeads(nn.Module):
  """Multi-head projection ``(B, T, d) -> (H, B, T, d)`` (reference
  `create_attention_heads`, ``attention_mechanism.py:69``): `depth` stacked
  Dense(d*H) layers, then split into heads."""

  num_heads: int = 2
  depth: int = 1
  use_bias: bool = True
  activation: Any = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    from odin_tpu.networks.base import get_activation
    if self.num_heads <= 1 or self.depth <= 0:
      return x[None] if self.num_heads > 1 else x
    d = x.shape[-1]
    h = x
    for i in range(self.depth):
      h = nn.Dense(d * self.num_heads, use_bias=self.use_bias,
                   name=f"head_proj_{i}")(h)
      h = get_activation(self.activation)(h)
      if i < self.depth - 1:  # intermediate layers stay at d*H width
        pass
    # (B, T, d*H) -> (H, B, T, d)
    h = h.reshape(h.shape[:-1] + (self.num_heads, d))
    return jnp.moveaxis(h, -2, 0)


def create_attention_heads(input_dim: int, num_heads: int = 2,
                           depth: int = 1, use_bias: bool = True,
                           activation: Any = "relu") -> AttentionHeads:
  """Factory form (reference ``attention_mechanism.py:69``); `input_dim`
  is inferred at call time in flax and kept for signature parity."""
  del input_dim
  return AttentionHeads(num_heads=num_heads, depth=depth,
                        use_bias=use_bias, activation=activation)
