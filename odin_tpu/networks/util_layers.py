"""Misc layers: Conv1DTranspose, BatchRenorm, ParallelNetwork, positional
encoding, skip connections, conditional embeddings, RNN wrappers.

Reference: ``odin/networks/util_layers.py`` (`Conv1DTranspose` :404,
`BatchRenormalization` :133, `ParallelNetwork` :336, Identity/ExpandDims/
Reduce), ``positional_encoder.py:9``, ``skip_connection.py:38``,
``conditional_embedding.py:25-237``, ``cudnn_rnn.py`` (the cuDNN kernels
become flax scan-based RNNs — XLA fuses the cell; no vendor kernels needed).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.networks.base import get_activation

__all__ = ["Identity", "ExpandDims", "Reduce", "Conv1DTranspose",
           "BatchRenormalization", "ParallelNetwork", "PositionalEncoder",
           "SkipConnection", "ConditionalEmbedding", "ConditionalProjection",
           "LSTM", "GRU", "SimpleRNN", "DepthToSpace", "Resampling2D"]


class Identity(nn.Module):

  def __call__(self, x, training: bool = False):
    return x


class ExpandDims(nn.Module):
  axis: int = -1

  def __call__(self, x, training: bool = False):
    return jnp.expand_dims(x, self.axis)


class Reduce(nn.Module):
  op: str = "mean"
  axis: int = 1

  def __call__(self, x, training: bool = False):
    return getattr(jnp, self.op)(x, axis=self.axis)


class Conv1DTranspose(nn.Module):
  """Reference ``util_layers.py:404``."""

  filters: int
  kernel_size: int = 3
  strides: int = 1
  activation: Optional[str] = None
  padding: str = "SAME"

  @nn.compact
  def __call__(self, x, training: bool = False):
    y = nn.ConvTranspose(self.filters, (self.kernel_size,),
                         strides=(self.strides,), padding=self.padding)(x)
    return get_activation(self.activation)(y)


class BatchRenormalization(nn.Module):
  """Batch renormalization (Ioffe 2017; reference :133): r/d-corrected batch
  statistics bounded by rmax/dmax, running averages in 'batch_stats'."""

  momentum: float = 0.99
  epsilon: float = 1e-3
  rmax: float = 3.0
  dmax: float = 5.0

  @nn.compact
  def __call__(self, x, training: bool = False):
    c = x.shape[-1]
    gamma = self.param("gamma", nn.initializers.ones, (c,))
    beta = self.param("beta", nn.initializers.zeros, (c,))
    ra_mean = self.variable("batch_stats", "mean",
                            lambda: jnp.zeros(c))
    ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c))
    if training:
      axes = tuple(range(x.ndim - 1))
      mean = jnp.mean(x, axis=axes)
      var = jnp.var(x, axis=axes)
      sigma = jnp.sqrt(var + self.epsilon)
      ra_sigma = jnp.sqrt(ra_var.value + self.epsilon)
      r = jax.lax.stop_gradient(
          jnp.clip(sigma / ra_sigma, 1.0 / self.rmax, self.rmax))
      d = jax.lax.stop_gradient(
          jnp.clip((mean - ra_mean.value) / ra_sigma, -self.dmax, self.dmax))
      xhat = (x - mean) / sigma * r + d
      ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
      ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
    else:
      xhat = (x - ra_mean.value) / jnp.sqrt(ra_var.value + self.epsilon)
    return gamma * xhat + beta


class ParallelNetwork(nn.Module):
  """Apply several sub-networks to the same input, concatenate outputs
  (reference :336)."""

  layers: Sequence[nn.Module] = ()
  axis: int = -1

  @nn.compact
  def __call__(self, x, training: bool = False):
    outs = [l(x, training=training) if isinstance(l, nn.Module) else l(x)
            for l in self.layers]
    return jnp.concatenate(outs, axis=self.axis)


class PositionalEncoder(nn.Module):
  """Sinusoidal positional encoding (reference ``positional_encoder.py:9``)."""

  max_len: int = 10000

  def __call__(self, x, training: bool = False):
    T, D = x.shape[-2], x.shape[-1]
    pos = np.arange(T)[:, None]
    i = np.arange(D)[None, :]
    angle = pos / np.power(self.max_len, (2 * (i // 2)) / D)
    pe = np.where(i % 2 == 0, np.sin(angle), np.cos(angle)).astype("float32")
    return x + jnp.asarray(pe)


class SkipConnection(nn.Module):
  """y = merge(layer(x), proj(x)) (reference ``skip_connection.py:38``)."""

  layer: Any = None
  merge: str = "add"  # 'add' | 'concat'

  @nn.compact
  def __call__(self, x, training: bool = False):
    y = self.layer(x, training=training)
    if self.merge == "concat":
      return jnp.concatenate([y, x], axis=-1)
    if x.shape[-1] != y.shape[-1]:
      x = nn.Dense(y.shape[-1], name="skip_proj")(x)
    return y + x


class ConditionalEmbedding(nn.Module):
  """Label -> dense embedding for conditional generation
  (reference ``conditional_embedding.py:25``); accepts one-hot or integer
  labels."""

  num_classes: int
  features: int = 32

  @nn.compact
  def __call__(self, y, training: bool = False):
    emb = nn.Embed(self.num_classes, self.features, name="embedding")
    if y.ndim >= 2 and y.shape[-1] == self.num_classes:
      # soft labels: matmul with the embedding table
      return y @ emb.embedding
    return emb(y.astype(jnp.int32))


class ConditionalProjection(nn.Module):
  """Project labels and merge into features (reference
  ``conditional_embedding.py:140-237``)."""

  features: int
  method: str = "add"  # 'add' | 'concat' | 'film'

  @nn.compact
  def __call__(self, x, y, training: bool = False):
    def _expand(v):
      # insert broadcast axes so a (B, F) conditioning matches (B, ..., F)
      while v.ndim < x.ndim:
        v = v[:, None]
      return v

    h = _expand(nn.Dense(self.features, name="cond_proj")(y))
    if self.method == "concat":
      return jnp.concatenate(
          [x, jnp.broadcast_to(h, x.shape[:-1] + (self.features,))], axis=-1)
    if self.method == "film":
      scale = _expand(nn.Dense(x.shape[-1], name="film_scale")(y))
      shift = _expand(nn.Dense(x.shape[-1], name="film_shift")(y))
      return x * (1 + scale) + shift
    if x.shape[-1] != self.features:
      x = nn.Dense(self.features, name="x_proj")(x)
    return x + h


class LSTM(nn.Module):
  """Unidirectional LSTM over (B, T, F) via nn.scan — the cuDNN-RNN
  replacement (reference ``cudnn_rnn.py``): XLA fuses the cell matmuls."""

  units: int
  return_sequences: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    cell = nn.OptimizedLSTMCell(self.units)
    carry = cell.initialize_carry(jax.random.PRNGKey(0),
                                  x[:, 0].shape)
    scan = nn.scan(type(cell), variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1, out_axes=1)
    carry, ys = scan(self.units, name="cell")(carry, x)
    return ys if self.return_sequences else ys[:, -1]


class GRU(nn.Module):
  units: int
  return_sequences: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    cell = nn.GRUCell(self.units)
    carry = cell.initialize_carry(jax.random.PRNGKey(0), x[:, 0].shape)
    scan = nn.scan(nn.GRUCell, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1, out_axes=1)
    carry, ys = scan(self.units, name="cell")(carry, x)
    return ys if self.return_sequences else ys[:, -1]


class SimpleRNN(nn.Module):
  """Elman tanh RNN over (B, T, F) via nn.scan (reference
  ``cudnn_rnn.py`` 'rnn_tanh' mode)."""

  units: int
  return_sequences: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    cell = nn.SimpleCell(self.units)
    carry = cell.initialize_carry(jax.random.PRNGKey(0), x[:, 0].shape)
    scan = nn.scan(nn.SimpleCell, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=1, out_axes=1)
    carry, ys = scan(self.units, name="cell")(carry, x)
    return ys if self.return_sequences else ys[:, -1]


class DepthToSpace(nn.Module):
  """Pixel-shuffle upsampling: (B, H, W, C*r^2) -> (B, H*r, W*r, C).

  The TPU-preferred alternative to ConvTranspose for learned upsampling
  (regular conv keeps the MXU busy; the shuffle is a free relayout —
  cf. the reference's up-sampling residual blocks, ``resnets.py``)."""

  block_size: int = 2

  def __call__(self, x, training: bool = False):
    r = self.block_size
    b, h, w, c = x.shape
    assert c % (r * r) == 0, (c, r)
    x = x.reshape(b, h, w, r, r, c // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, c // (r * r))


class Resampling2D(nn.Module):
  """Nearest/linear spatial resize by a factor (reference
  ``networks/resnets.py`` `Resampling2D` / `upsampling2D`)."""

  factor: float = 2.0
  method: str = "nearest"

  def __call__(self, x, training: bool = False):
    b, h, w, c = x.shape
    out = (b, int(round(h * self.factor)), int(round(w * self.factor)), c)
    return jax.image.resize(x, out, method=self.method)
