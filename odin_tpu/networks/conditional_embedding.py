"""Label -> tensor embedders for conditional generative models.

Reference: ``odin/networks/conditional_embedding.py`` (`IdentityEmbedding`
:47, `RepetitionEmbedding` :61, `DictionaryEmbedding` :94,
`ProjectionEmbedding` :129, `SequentialEmbedding` :153, `get_embedding`
:220).  Redesigned as flax modules: each embedder maps a label batch —
int indices ``(B,)``, one-hot/soft ``(B, n_classes)`` — to a dense tensor
of ``(B,) + event_shape`` so it can be concatenated into encoder/decoder
trunks (the reference uses them for q(z|x,y) / p(x|z,y) conditioning and
ConditionalGAN label planes).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["Embedder", "IdentityEmbedding", "RepetitionEmbedding",
           "DictionaryEmbedding", "ProjectionEmbedding",
           "SequentialEmbedding", "all_embedder", "get_embedding"]


def _as_shape(event_shape) -> Tuple[int, ...]:
  if isinstance(event_shape, (int, float)):
    return (int(event_shape),)
  return tuple(int(s) for s in event_shape)


def _to_indices(y: jnp.ndarray) -> jnp.ndarray:
  """(B,) int32 class indices from int labels or one-hot/soft vectors
  (reference `_to_categorical`, ``conditional_embedding.py:32``)."""
  if y.ndim >= 2 and y.shape[-1] > 1:
    return jnp.argmax(y, axis=-1).astype(jnp.int32)
  return jnp.reshape(y, y.shape[:1] + y.shape[1:][:0]).astype(jnp.int32) \
      if y.ndim > 1 else y.astype(jnp.int32)


class Embedder:
  """Mixin marking label embedders; `event_shape` is the per-sample output
  shape (reference ``conditional_embedding.py:25``)."""

  @property
  def output_shape(self) -> Tuple[int, ...]:
    return _as_shape(self.event_shape)


class IdentityEmbedding(nn.Module, Embedder):
  """Pass labels through unchanged."""

  n_classes: int
  event_shape: Sequence[int] = ()

  def __call__(self, y, training: bool = False):
    return y


class RepetitionEmbedding(nn.Module, Embedder):
  """Broadcast + tile labels across the leading event axes so the result is
  concatenate-able to a feature map: ``(B, n) -> (B, *event_shape[:-1], n)``
  (the reference repeats axis-by-axis wherever the input size is 1)."""

  n_classes: int
  event_shape: Sequence[int] = ()

  def __call__(self, y, training: bool = False):
    shape = _as_shape(self.event_shape)
    if y.ndim == 1:
      y = y[:, None]
    target_ndim = len(shape) + 1
    if y.ndim > target_ndim:
      raise ValueError(f"cannot broadcast labels {y.shape[1:]} to "
                       f"event_shape {shape}")
    while y.ndim < target_ndim:
      y = y[:, None]
    reps = [1]
    for i, s in enumerate(y.shape[1:]):
      reps.append(shape[i] if (s == 1 and shape[i] != 1) else 1)
    return jnp.tile(y, reps)


class DictionaryEmbedding(nn.Module, Embedder):
  """Lookup-table embedding: class index -> learned vector reshaped to
  `event_shape` (one-hot/soft labels are argmax-folded first)."""

  n_classes: int
  event_shape: Sequence[int] = ()

  @nn.compact
  def __call__(self, y, training: bool = False):
    shape = _as_shape(self.event_shape)
    idx = _to_indices(jnp.asarray(y))
    out = nn.Embed(self.n_classes, int(np.prod(shape)),
                   name="table")(idx)
    return out.reshape((out.shape[0],) + shape)


class ProjectionEmbedding(nn.Module, Embedder):
  """Dense projection of the (one-hot/soft) label vector to `event_shape` —
  keeps soft-label gradients (the M2 relaxed-label path needs this)."""

  n_classes: int
  event_shape: Sequence[int] = ()
  activation: Optional[Callable] = None
  use_bias: bool = True

  @nn.compact
  def __call__(self, y, training: bool = False):
    shape = _as_shape(self.event_shape)
    if y.ndim == 1:  # int labels: one-hot keeps the projection semantics
      y = jax.nn.one_hot(y.astype(jnp.int32), self.n_classes)
    out = nn.Dense(int(np.prod(shape)), use_bias=self.use_bias,
                   name="proj")(y)
    if self.activation is not None:
      out = self.activation(out)
    return out.reshape((out.shape[0],) + shape)


class SequentialEmbedding(nn.Module, Embedder):
  """Dictionary lookup then dense projection (the ConditionalGAN recipe:
  embed to `embedding_dim`, project to the target plane)."""

  n_classes: int
  event_shape: Sequence[int] = ()
  embedding_dim: int = 100
  activation: Optional[Callable] = None
  use_bias: bool = True

  @nn.compact
  def __call__(self, y, training: bool = False):
    shape = _as_shape(self.event_shape)
    idx = _to_indices(jnp.asarray(y))
    h = nn.Embed(self.n_classes, self.embedding_dim, name="table")(idx)
    out = nn.Dense(int(np.prod(shape)), use_bias=self.use_bias,
                   name="proj")(h)
    if self.activation is not None:
      out = self.activation(out)
    return out.reshape((out.shape[0],) + shape)


all_embedder = dict(repetition=RepetitionEmbedding,
                    projection=ProjectionEmbedding,
                    dictionary=DictionaryEmbedding,
                    sequential=SequentialEmbedding,
                    identity=IdentityEmbedding)


def get_embedding(method: str):
  """Resolve an embedder class by name (prefix-tolerant, reference
  ``conditional_embedding.py:220``)."""
  method = str(method).strip().lower()
  for name, cls in all_embedder.items():
    if method == name or method in name:
      return cls
  raise KeyError(f"no conditional embedding method {method!r}; "
                 f"supported: {sorted(all_embedder)}")
