"""VariationalModel — ELBO configuration + estimators.

Reference: ``odin/bay/vi/_base.py`` — ELBO config (analytic, reverse,
free_bits, sample_shape), ``elbo(llk, kl) = Σ llk − Σ kl`` (:151-194),
`importance_weighted` IWAE estimator (:91-122), `perplexity` (:233),
`sample_traverse` latent traversal (:326-383).

The TPU design holds the *model object* (architecture + hyperparameters +
current TrainState) on host; every computation is a pure jitted function of
(params, batch, rng, step).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.backend.interpolation import Interpolation

__all__ = ["VariationalModel", "traverse_dims"]


def _sum_dict(d: Dict[str, jax.Array]) -> jax.Array:
  vals = list(d.values())
  out = vals[0]
  for v in vals[1:]:
    out = out + v
  return out


def traverse_dims(z: jax.Array,
                  feature_indices: Optional[Sequence[int]] = None,
                  min_val: float = -2.0,
                  max_val: float = 2.0,
                  n_traverse_points: int = 11,
                  mode: str = "linear") -> jax.Array:
  """Tile `z` and sweep each selected latent dimension across
  [min_val, max_val] — reference ``odin/bay/vi/utils.py:272`` (`traverse_dims`).

  Returns array of shape ``(n_points * n_indices * batch, zdim)`` ordered as
  [dim0-sweep..., dim1-sweep...].
  """
  z = jnp.asarray(z)
  if z.ndim == 1:
    z = z[None]
  zdim = z.shape[-1]
  if feature_indices is None:
    feature_indices = list(range(zdim))
  if mode == "linear":
    pts = jnp.linspace(min_val, max_val, n_traverse_points)
  elif mode == "quantile":
    pts = jnp.quantile(z, jnp.linspace(0.0, 1.0, n_traverse_points))
  else:
    raise ValueError(f"unknown traverse mode {mode}")
  outs = []
  for idx in feature_indices:
    tiled = jnp.tile(z[None], (n_traverse_points, 1, 1))  # (P, B, zdim)
    tiled = tiled.at[:, :, idx].set(pts[:, None])
    outs.append(tiled.reshape(-1, zdim))
  return jnp.concatenate(outs, axis=0)


class VariationalModel:
  """Base for all variational models: ELBO bookkeeping + estimators."""

  def __init__(self,
               analytic: bool = False,
               reverse: bool = True,
               free_bits: Optional[float] = None,
               sample_shape: Union[int, Tuple[int, ...]] = (),
               allow_negative_kl: bool = True,
               name: Optional[str] = None):
    self.analytic = bool(analytic)
    self.reverse = bool(reverse)
    self.free_bits = free_bits
    if isinstance(sample_shape, int):
      sample_shape = (sample_shape,) if sample_shape > 1 else ()
    self.sample_shape = tuple(sample_shape)
    self.allow_negative_kl = bool(allow_negative_kl)
    self.name = name or type(self).__name__.lower()

  @classmethod
  def is_semi_supervised(cls) -> bool:
    """Whether the model consumes (x, y[, mask]) batches (reference
    ``_base.py`` classmethod); semi-supervised families override."""
    return False

  # -- ELBO -----------------------------------------------------------------
  def elbo(self,
           llk: Dict[str, jax.Array],
           kl: Dict[str, jax.Array]) -> jax.Array:
    """``Σ llk − Σ kl`` elementwise over the batch
    (reference ``_base.py:151-194``)."""
    total_llk = _sum_dict(llk) if llk else jnp.zeros(())
    total_kl = _sum_dict(kl) if kl else jnp.zeros(())
    return total_llk - total_kl

  @staticmethod
  def importance_weighted(elbo_samples: jax.Array, axis: int = 0) -> jax.Array:
    """IWAE bound: log-mean-exp over the sample axis
    (reference ``_base.py:91-122``)."""
    n = elbo_samples.shape[axis]
    return jax.scipy.special.logsumexp(elbo_samples, axis=axis) - jnp.log(float(n))

  @staticmethod
  def perplexity(log_likelihood: jax.Array, n_words: jax.Array) -> jax.Array:
    """exp(-llk / n_words) (reference ``_base.py:233``)."""
    return jnp.exp(-log_likelihood / jnp.maximum(n_words, 1.0))

  # -- schedules ------------------------------------------------------------
  @staticmethod
  def _schedule(value, step):
    """Resolve a (possibly Interpolation-scheduled) coefficient at `step`."""
    if isinstance(value, Interpolation):
      return value(step)
    return jnp.asarray(value, jnp.float32)
