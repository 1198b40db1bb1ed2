"""Distribution base classes — a minimal, TPU-native distribution library.

The reference builds on TensorFlow Probability (``odin/bay`` wraps ~40 TFP
distribution aliases, ``odin/bay/distribution_alias.py:118``).  Rebuilding on
TPU we implement the needed distribution set in-repo as **JAX pytrees**: every
distribution is a pytree whose leaves are its parameter arrays, so whole
distributions flow through ``jit`` / ``vmap`` / ``shard_map`` boundaries and
can be returned from compiled train steps.

Conventions (TFP-compatible so the VAE zoo semantics carry over):
  * ``batch_shape`` + ``event_shape`` factorization; ``log_prob`` reduces over
    the event dims only.
  * ``sample(seed, sample_shape)`` is explicit-RNG (idiomatic JAX rather than
    TFP's stateful seeds).
  * ``Independent`` reinterprets batch dims as event dims (sum of log_probs),
    which is how ``event_shape`` heads are built from scalar families.
  * ``kl_divergence(q, p)`` dispatches through a (type, type) registry with an
    MC fallback — the analytic-vs-MCMC switch of ``odin/bay/helpers.py:177``.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Distribution",
    "Independent",
    "register_kl",
    "kl_registry_lookup",
    "exact_kl",
]

Array = jax.Array


def _shapes_broadcast(*shapes) -> Tuple[int, ...]:
  # jnp.broadcast_shapes (not np) so symbolic dims from jax.export shape
  # polymorphism broadcast correctly
  out: Tuple[int, ...] = ()
  for s in shapes:
    out = jnp.broadcast_shapes(out, tuple(s))
  return tuple(out)


class Distribution:
  """Base distribution; subclasses declare parameter fields via ``_params``.

  ``_params`` lists array attributes (pytree leaves); everything else set in
  ``__init__`` must be static/hashable and listed in ``_static`` (pytree aux).
  """

  _params: Tuple[str, ...] = ()
  _static: Tuple[str, ...] = ()

  def __init_subclass__(cls, **kwargs):
    super().__init_subclass__(**kwargs)

    def flatten(d):
      children = tuple(getattr(d, name) for name in cls._params)
      aux = tuple(getattr(d, name) for name in cls._static)
      return children, aux

    def unflatten(aux, children):
      obj = object.__new__(cls)
      for name, val in zip(cls._params, children):
        object.__setattr__(obj, name, val)
      for name, val in zip(cls._static, aux):
        object.__setattr__(obj, name, val)
      return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)

  # -- shape interface ------------------------------------------------------
  @property
  def batch_shape(self) -> Tuple[int, ...]:
    raise NotImplementedError

  @property
  def event_shape(self) -> Tuple[int, ...]:
    return ()

  @property
  def dtype(self):
    return jnp.result_type(*(getattr(self, n) for n in self._params)) \
        if self._params else jnp.float32

  # -- core interface -------------------------------------------------------
  def sample(self, seed: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
    raise NotImplementedError

  def log_prob(self, x: Array) -> Array:
    raise NotImplementedError

  def prob(self, x: Array) -> Array:
    return jnp.exp(self.log_prob(x))

  def mean(self) -> Array:
    raise NotImplementedError

  def mode(self) -> Array:
    raise NotImplementedError

  def variance(self) -> Array:
    raise NotImplementedError

  def stddev(self) -> Array:
    return jnp.sqrt(self.variance())

  def entropy(self) -> Array:
    raise NotImplementedError

  def kl_divergence(self, other: "Distribution",
                    analytic: bool = True,
                    samples: Optional[Array] = None,
                    seed: Optional[Array] = None,
                    n_samples: int = 1) -> Array:
    """KL(self || other); analytic when a registered pair exists, otherwise
    Monte-Carlo ``E_q[log q(z) - log p(z)]`` over `samples` (drawn here with
    `seed` when not given)."""
    if analytic:
      fn = kl_registry_lookup(type(self), type(other))
      if fn is not None:
        return fn(self, other)
    if samples is None:
      if seed is None:
        raise ValueError(
            f"no analytic KL for ({type(self).__name__}, {type(other).__name__}) "
            "— provide `samples` or `seed` for an MC estimate")
      samples = self.sample(seed, (n_samples,))
    lq = self.log_prob(samples)
    lp = other.log_prob(samples)
    return jnp.mean(lq - lp, axis=0)

  # `KL_divergence` alias keeps the reference spelling
  # (``odin/bay/layers/dense_distribution.py:377-380``).
  KL_divergence = kl_divergence

  def __repr__(self):
    try:
      return (f"{type(self).__name__}(batch_shape={self.batch_shape}, "
              f"event_shape={self.event_shape})")
    except Exception:
      return f"{type(self).__name__}(...)"


# ---------------------------------------------------------------------------
# KL registry
# ---------------------------------------------------------------------------
_KL_REGISTRY: Dict[Tuple[type, type], Callable] = {}


def register_kl(type_q: type, type_p: type):
  """Decorator registering an analytic ``KL(q || p)`` for a type pair."""

  def wrap(fn):
    _KL_REGISTRY[(type_q, type_p)] = fn
    return fn

  return wrap


def kl_registry_lookup(type_q: type, type_p: type) -> Optional[Callable]:
  # exact, then MRO-based lookup so subclasses inherit KLs
  for tq in type_q.__mro__:
    for tp in type_p.__mro__:
      fn = _KL_REGISTRY.get((tq, tp))
      if fn is not None:
        return fn
  return None


def exact_kl(q: Distribution, p: Distribution) -> Array:
  fn = kl_registry_lookup(type(q), type(p))
  if fn is None:
    raise NotImplementedError(
        f"no analytic KL registered for ({type(q).__name__}, {type(p).__name__})")
  return fn(q, p)


# ---------------------------------------------------------------------------
# Independent
# ---------------------------------------------------------------------------
class Independent(Distribution):
  """Reinterpret the trailing `reinterpreted_batch_ndims` batch dims of a base
  distribution as event dims (log_prob sums over them).  Mirrors
  ``tfd.Independent`` which the reference uses to build event-shaped heads."""

  _params = ("distribution",)
  _static = ("reinterpreted_batch_ndims",)

  def __init__(self, distribution: Distribution, reinterpreted_batch_ndims: int = 1):
    self.distribution = distribution
    self.reinterpreted_batch_ndims = int(reinterpreted_batch_ndims)

  @property
  def batch_shape(self):
    b = self.distribution.batch_shape
    k = self.reinterpreted_batch_ndims
    return b[:len(b) - k] if k > 0 else b

  @property
  def event_shape(self):
    b = self.distribution.batch_shape
    k = self.reinterpreted_batch_ndims
    return (b[len(b) - k:] if k > 0 else ()) + self.distribution.event_shape

  @property
  def dtype(self):
    return self.distribution.dtype

  def _reduce(self, x):
    k = self.reinterpreted_batch_ndims
    if k == 0:
      return x
    return jnp.sum(x, axis=tuple(range(-k, 0)))

  def sample(self, seed, sample_shape=()):
    return self.distribution.sample(seed, sample_shape)

  def log_prob(self, x):
    return self._reduce(self.distribution.log_prob(x))

  def mean(self):
    return self.distribution.mean()

  def mode(self):
    return self.distribution.mode()

  def variance(self):
    return self.distribution.variance()

  def entropy(self):
    return self._reduce(self.distribution.entropy())


@register_kl(Independent, Independent)
def _kl_independent(q: Independent, p: Independent):
  if q.reinterpreted_batch_ndims != p.reinterpreted_batch_ndims:
    raise ValueError("Independent KL requires matching reinterpreted_batch_ndims")
  inner = exact_kl(q.distribution, p.distribution)
  k = q.reinterpreted_batch_ndims
  return jnp.sum(inner, axis=tuple(range(-k, 0))) if k > 0 else inner
