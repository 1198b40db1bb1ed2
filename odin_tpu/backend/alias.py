"""Name -> object parsers for the JAX stack.

Reference: ``odin/backend/alias.py`` — `parse_activation` (with '+'
concatenation, :93), `parse_initializer` (:140), `parse_optimizer` (:163),
`parse_regularizer` (:191), `parse_constraint` (:201), `parse_reduction`
(:214), `parse_attention` (:240), `parse_normalizer` (:244), `parse_layer`
(:264), `parse_loss`/`parse_metric` (:271,:275).  The reference dispatches
into keras/torch per framework; here everything resolves to jax/flax/optax
objects.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp

__all__ = [
    "identity_function", "parse_activation", "parse_initializer",
    "parse_optimizer", "parse_regularizer", "parse_constraint",
    "parse_reduction", "parse_attention", "parse_normalizer", "parse_layer",
    "parse_loss", "parse_metric",
]


def identity_function(x):
  return x


def _invalid(msg: str, obj: Any):
  raise ValueError(f"{msg}: '{obj}'")


def parse_activation(activation: Union[str, Callable, None],
                     framework: Any = None) -> Callable:
  """Alias -> activation fn; '+' composes left-to-right
  (reference :93-138, `_SequentialActivation`)."""
  from odin_tpu.networks.base import get_activation
  if activation is None or callable(activation):
    return get_activation(activation)
  fns = [get_activation(a.strip()) for a in str(activation).split("+")]
  if len(fns) == 1:
    return fns[0]

  def seq(x):
    for f in fns:
      x = f(x)
    return x

  return seq


def parse_initializer(initializer: Union[str, Callable],
                      framework: Any = None) -> Callable:
  """Alias -> flax/jax initializer (reference :140-160)."""
  if callable(initializer):
    return initializer
  key = str(initializer).lower().strip().replace("_", "")
  init = jax.nn.initializers
  table = {
      "zeros": init.zeros,
      "ones": init.ones,
      "glorotuniform": init.glorot_uniform(),
      "glorotnormal": init.glorot_normal(),
      "xavieruniform": init.glorot_uniform(),
      "xaviernormal": init.glorot_normal(),
      "heuniform": init.he_uniform(),
      "henormal": init.he_normal(),
      "lecununiform": init.lecun_uniform(),
      "lecunnormal": init.lecun_normal(),
      "orthogonal": init.orthogonal(),
      "normal": init.normal(stddev=0.05),
      "randomnormal": init.normal(stddev=0.05),
      "truncatednormal": init.truncated_normal(stddev=0.05),
      "uniform": init.uniform(scale=0.05),
      "randomuniform": init.uniform(scale=0.05),
      "kaiminguniform": init.he_uniform(),
      "kaimingnormal": init.he_normal(),
  }
  if key not in table:
    _invalid("No support for initializer", initializer)
  return table[key]


def parse_optimizer(optimizer: Union[str, Any],
                    framework: Any = None) -> Callable:
  """Alias -> optax optimizer factory ``f(learning_rate, **kw)``
  (reference :163-188 returns the optimizer class)."""
  import optax

  from odin_tpu.training.core import make_optimizer
  if not isinstance(optimizer, str):
    return optimizer

  def factory(learning_rate=1e-3, **kwargs) -> optax.GradientTransformation:
    return make_optimizer(optimizer, learning_rate=learning_rate, **kwargs)

  factory.__name__ = f"optax_{str(optimizer).lower()}"
  return factory


def parse_regularizer(regularizer: Union[str, Callable, None],
                      framework: Any = None) -> Optional[Callable]:
  """Alias -> weight-penalty fn ``f(params_pytree) -> scalar``
  (reference :191-198)."""
  if regularizer is None or callable(regularizer):
    return regularizer
  key = str(regularizer).lower().strip()

  def _sum(tree, f):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(f(l)) for l in leaves) if leaves else jnp.float32(0)

  if key in ("l1",):
    return lambda tree, scale=0.01: scale * _sum(tree, jnp.abs)
  if key in ("l2",):
    return lambda tree, scale=0.01: scale * _sum(tree, jnp.square)
  if key in ("l1l2", "l1_l2"):
    return lambda tree, l1=0.01, l2=0.01: (l1 * _sum(tree, jnp.abs) +
                                           l2 * _sum(tree, jnp.square))
  _invalid("No support for regularizer", regularizer)


def parse_constraint(constraint: Union[str, Callable, None],
                     framework: Any = None) -> Optional[Callable]:
  """Alias -> parameter projection applied post-update
  (reference :201-211)."""
  if constraint is None or callable(constraint):
    return constraint
  key = str(constraint).lower().strip().replace("_", "")
  if key in ("nonneg", "nonnegative"):
    return lambda w: jnp.maximum(w, 0.0)
  if key in ("unitnorm",):
    return lambda w, axis=0: w / (
        jnp.linalg.norm(w, axis=axis, keepdims=True) + 1e-12)
  if key in ("maxnorm",):
    def max_norm(w, max_value=2.0, axis=0):
      n = jnp.linalg.norm(w, axis=axis, keepdims=True)
      return w * jnp.clip(n, 0, max_value) / (n + 1e-12)
    return max_norm
  _invalid("No support for constraint", constraint)


def parse_reduction(reduce: Union[str, None],
                    framework: Any = None) -> Callable:
  """Alias -> reduction fn (reference :214-238, incl. the 'stat'
  mean||std concatenation used by pooling layers)."""
  if reduce is None:
    reduce = "none"
  if callable(reduce):
    return reduce
  key = str(reduce).lower()
  if "min" in key:
    return jnp.min
  if "max" in key:
    return jnp.max
  if "avg" in key or "mean" in key:
    return jnp.mean
  if "sum" in key:
    return jnp.sum
  if "stat" in key:
    def stat_reduce(x, axis=None, keepdims=False):
      m = jnp.mean(x, axis=axis, keepdims=keepdims)
      s = jnp.std(x, axis=axis, keepdims=keepdims)
      return jnp.concatenate([m, s], axis=-1)
    return stat_reduce
  if "none" in key or key == "":
    return lambda x, *a, **kw: x
  _invalid("No support for reduce", reduce)


def parse_attention(attention: Union[str, Any],
                    framework: Any = None):
  """Alias -> attention layer class (reference :240)."""
  from odin_tpu.networks import attention as _att
  if not isinstance(attention, str):
    return attention
  key = attention.lower().replace("_", "").replace("attention", "")
  table = {
      "": _att.Attention,
      "self": _att.SelfAttention,
      "global": _att.GlobalAttention,
      "local": _att.LocalPredictiveAttention,
      "localpredictive": _att.LocalPredictiveAttention,
      "multihead": _att.MultiHeadAttention,
  }
  if key not in table:
    _invalid("No support for attention", attention)
  return table[key]


def parse_normalizer(normalizer: Union[str, Any],
                     framework: Any = None):
  """Alias -> flax normalization layer class (reference :244-261)."""
  import flax.linen as nn
  if not isinstance(normalizer, str):
    return normalizer
  key = normalizer.lower().replace("_", "").replace("norm", "") \
      .replace("alization", "")
  table = {"batch": nn.BatchNorm, "layer": nn.LayerNorm,
           "group": nn.GroupNorm, "rms": nn.RMSNorm}
  if key not in table:
    _invalid("No support for normalizer", normalizer)
  return table[key]


def parse_layer(layer: Union[str, Any], framework: Any = None):
  """Alias -> layer class from ``odin_tpu.networks`` (reference :264)."""
  import odin_tpu.networks as _nets
  if not isinstance(layer, str):
    return layer
  for name in dir(_nets):
    if name.lower() == layer.lower().replace("_", ""):
      obj = getattr(_nets, name)
      if inspect.isclass(obj):
        return obj
  _invalid("No support for layer", layer)


def parse_loss(loss: Union[str, Callable], framework: Any = None) -> Callable:
  """Alias -> loss fn from optax / ``odin_tpu.backend.losses``
  (reference :271)."""
  import optax

  from odin_tpu.backend import losses as _losses
  if callable(loss):
    return loss
  key = str(loss).lower().strip()
  aliases = {
      "mse": lambda y, p: optax.squared_error(p, y),
      "mae": lambda y, p: jnp.abs(p - y),
      "huber": lambda y, p: optax.huber_loss(p, y),
      "categorical_crossentropy":
          lambda y, p: optax.softmax_cross_entropy(p, y),
      "sparse_categorical_crossentropy":
          lambda y, p: optax.softmax_cross_entropy_with_integer_labels(p, y),
      "binary_crossentropy":
          lambda y, p: optax.sigmoid_binary_cross_entropy(p, y),
      "cosine_similarity": _losses.cosine_similarity,
      "contrastive": _losses.contrastive_loss,
      "triplet": _losses.triplet_loss,
  }
  if key in aliases:
    return aliases[key]
  fn = getattr(_losses, key, None)
  if fn is not None and callable(fn):
    return fn
  _invalid("No support for loss", loss)


def parse_metric(metric: Union[str, Callable],
                 framework: Any = None) -> Callable:
  """Alias -> metric fn from ``odin_tpu.backend.metrics`` (reference :275)."""
  from odin_tpu.backend import metrics as _metrics
  if callable(metric):
    return metric
  key = str(metric).lower().strip()
  if key in ("acc", "accuracy"):
    return lambda y, p: float(
        (jnp.argmax(jnp.asarray(p), -1) ==
         jnp.asarray(y).reshape(-1)).mean())
  fn = getattr(_metrics, key, None)
  if fn is not None and callable(fn):
    return fn
  _invalid("No support for metric", metric)
