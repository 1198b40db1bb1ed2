"""Time-delay neural network (TDNN) layers — x-vector building blocks.

Reference: ``odin/networks/time_delay.py:39-319`` — `TimeDelay`,
`TimeDelayDense`, `TimeDelayConv`, `TimeDelayConvTied`: dense/conv layers
applied over sliding temporal context windows.

TPU realization: temporal context = 1-D convolution with the given context
size/dilation — the MXU-friendly formulation (the reference gathers frames
then applies Dense; a dilated Conv1D is identical math without the gather).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.networks.base import get_activation

__all__ = ["TimeDelay", "TimeDelayDense", "TimeDelayConv", "TimeDelayConvTied",
           "StatsPool", "XVectorNet"]


class TimeDelay(nn.Module):
  """Dense over a sliding window of frames: input (B, T, F) -> (B, T', U).

  `context` e.g. (-2, -1, 0, 1, 2) — symmetric window; non-contiguous
  contexts (e.g. (-3, 0, 3)) realize dilation (reference :39).
  """

  units: int
  context: Tuple[int, ...] = (-2, -1, 0, 1, 2)
  activation: str = "relu"
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    ctx = sorted(self.context)
    offsets = [c - ctx[0] for c in ctx]
    span = ctx[-1] - ctx[0] + 1
    # uniformly-spaced context -> dilated Conv1D; irregular -> gather+Dense
    gaps = set(int(g) for g in np.diff(ctx)) if len(ctx) > 1 else {1}
    if len(gaps) == 1:
      dilation = gaps.pop() if len(ctx) > 1 else 1
      y = nn.Conv(self.units, (len(ctx),), strides=(1,),
                  kernel_dilation=(dilation,), padding="VALID",
                  use_bias=self.use_bias)(x)
    else:
      # irregular context: gather frames then Dense
      T = x.shape[1]
      valid = T - span + 1
      cols = [x[:, o:o + valid] for o in offsets]
      y = nn.Dense(self.units, use_bias=self.use_bias)(
          jnp.concatenate(cols, axis=-1))
    return get_activation(self.activation)(y)


class TimeDelayDense(TimeDelay):
  """Context (0,) — per-frame dense (reference :200)."""

  context: Tuple[int, ...] = (0,)


class TimeDelayConv(nn.Module):
  """Conv1D-flavoured TDNN block (reference :247)."""

  units: int
  kernel_size: int = 5
  dilation: int = 1
  activation: str = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    y = nn.Conv(self.units, (self.kernel_size,),
                kernel_dilation=(self.dilation,), padding="SAME")(x)
    return get_activation(self.activation)(y)


class TimeDelayConvTied(nn.Module):
  """Weight-tied variant: one kernel applied at several dilations, summed
  (reference :319)."""

  units: int
  kernel_size: int = 3
  dilations: Tuple[int, ...] = (1, 2, 3)
  activation: str = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    kernel = self.param("kernel", nn.initializers.he_normal(),
                        (self.kernel_size, x.shape[-1], self.units))
    bias = self.param("bias", nn.initializers.zeros, (self.units,))
    out = 0.0
    for d in self.dilations:
      out = out + jax.lax.conv_general_dilated(
          x, kernel, window_strides=(1,), padding="SAME",
          rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"))
    return get_activation(self.activation)(out + bias)


class StatsPool(nn.Module):
  """Mean+std pooling over time — the x-vector statistics layer."""

  def __call__(self, x, training: bool = False):
    mean = jnp.mean(x, axis=1)
    std = jnp.sqrt(jnp.maximum(jnp.var(x, axis=1), 1e-8))
    return jnp.concatenate([mean, std], axis=-1)


class XVectorNet(nn.Module):
  """Standard x-vector architecture (Snyder et al.): 5 TDNN layers ->
  stats pooling -> 2 embedding layers.  (The reference builds this in its
  nist_sre recipes from TimeDelay blocks.)"""

  n_classes: int = 0  # 0 -> return embedding
  embedding_dim: int = 512

  @nn.compact
  def __call__(self, x, training: bool = False, return_embedding: bool = False):
    for units, ks, dil in [(512, 5, 1), (512, 3, 2), (512, 3, 3),
                           (512, 1, 1), (1500, 1, 1)]:
      x = TimeDelayConv(units, kernel_size=ks, dilation=dil)(x,
                                                             training=training)
    x = StatsPool()(x)
    emb_a = nn.Dense(self.embedding_dim, name="embedding_a")(x)
    if return_embedding or self.n_classes == 0:
      return emb_a
    h = jax.nn.relu(emb_a)
    h = jax.nn.relu(nn.Dense(self.embedding_dim, name="embedding_b")(h))
    return nn.Dense(self.n_classes, name="classifier")(h)
