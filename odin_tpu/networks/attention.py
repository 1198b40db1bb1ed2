"""Attention layers.

Reference: ``odin/networks/attention_mechanism.py:92`` (`AttentionMechanism`
IntFlag algebra: scoredot/scoreloc/mul/add x global/local-m/local-p x
self/cross, soft/hard) and ``odin/networks/attention.py:22-276``
(`Attention`, `SelfAttention`, `GlobalAttention`, `LocalPredictiveAttention`).

TPU redesign: the flag algebra collapses to explicit, composable modules —
scaled-dot / additive scoring, global or local-predictive windows, soft
attention (hard/REINFORCE modes of the reference are sampling-based
estimators that the functional API exposes via `temperature`).
"""
from __future__ import annotations

from enum import IntFlag, auto
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AttentionMechanism", "Attention", "SelfAttention",
           "GlobalAttention", "LocalPredictiveAttention",
           "MultiHeadAttention"]


class AttentionMechanism(IntFlag):
  """Flag set kept for API parity (reference ``attention_mechanism.py:92``)."""

  ScoreDot = auto()
  ScoreAdditive = auto()
  ScoreLocation = auto()
  Global = auto()
  LocalM = auto()
  LocalP = auto()
  Self = auto()
  Cross = auto()
  Soft = auto()
  Hard = auto()


class Attention(nn.Module):
  """Scaled-dot or additive attention over (query, key, value).

  __call__(q, k=None, v=None) with k/v defaulting to q (self-attention).
  Returns (context, weights).
  """

  units: Optional[int] = None
  score: str = "dot"          # 'dot' | 'additive' | 'location'
  causal: bool = False
  temperature: float = 1.0

  @nn.compact
  def __call__(self, q, k=None, v=None, mask=None, training: bool = False):
    k = q if k is None else k
    v = k if v is None else v
    d = self.units or q.shape[-1]
    if self.units is not None:
      q = nn.Dense(d, name="q_proj")(q)
      k = nn.Dense(d, name="k_proj")(k)
    if self.score == "dot":
      logits = jnp.einsum("btd,bsd->bts", q, k) / np.sqrt(d)
    elif self.score == "additive":
      w = nn.Dense(d, name="w_add")
      u = nn.Dense(d, name="u_add")
      vvec = self.param("v_add", nn.initializers.normal(0.02), (d,))
      logits = jnp.einsum(
          "btsd,d->bts", jnp.tanh(w(q)[:, :, None, :] + u(k)[:, None, :, :]),
          vvec)
    elif self.score == "location":
      logits = jnp.broadcast_to(
          nn.Dense(1, name="loc")(q),
          q.shape[:2] + (k.shape[1],))
    else:
      raise ValueError(f"unknown score '{self.score}'")
    if self.causal:
      t, s = logits.shape[-2], logits.shape[-1]
      causal = np.tril(np.ones((t, s), bool), k=s - t)
      logits = jnp.where(causal[None], logits, -1e30)
    if mask is not None:
      logits = jnp.where(mask.astype(bool), logits, -1e30)
    weights = jax.nn.softmax(logits / self.temperature, axis=-1)
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
  a Gaussian window over the keys (reference local-p mode)."""

  units: Optional[int] = None
  window: int = 8

  @nn.compact
  def __call__(self, q, k, v=None, training: bool = False):
    v = k if v is None else v
    S = k.shape[1]
    # predicted center position per query step in [0, S)
    p = jax.nn.sigmoid(
        nn.Dense(1, name="position")(jnp.tanh(nn.Dense(
            self.units or q.shape[-1], name="pos_hidden")(q))))[..., 0] * S
    positions = jnp.arange(S)[None, None, :]
    gauss = jnp.exp(-0.5 * ((positions - p[..., None]) /
                            (self.window / 2.0)) ** 2)
    ctx, w = Attention(units=self.units, name="attn")(q, k, v,
                                                      training=training)
    weighted = w * gauss
    weighted = weighted / jnp.maximum(weighted.sum(-1, keepdims=True), 1e-9)
    return jnp.einsum("bts,bsd->btd", weighted, v)


class MultiHeadAttention(nn.Module):
  """Standard multi-head attention (thin wrapper over flax for
  completeness)."""

  num_heads: int = 4
  qkv_features: Optional[int] = None

  @nn.compact
  def __call__(self, q, k=None, v=None, mask=None, training: bool = False):
    k = q if k is None else k
    v = k if v is None else v
    return nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, qkv_features=self.qkv_features,
        deterministic=not training)(q, k, v, mask=mask)
