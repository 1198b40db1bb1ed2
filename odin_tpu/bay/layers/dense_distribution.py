"""Distribution heads: Dense projection -> Distribution pytree.

Reference: ``odin/bay/layers/dense_distribution.py:75`` (`DistributionDense`)
— a Dense(params_size) followed by a DistributionLambda, with the prior and
`KL_divergence` attached.  Here the head is a flax module whose __call__
returns a Distribution (a pytree, so it crosses jit boundaries untouched);
the prior is available via ``.prior`` (built from the alias registry's
defaults, ``odin/bay/random_variable.py:47-157``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distribution_alias import DistSpec, parse_distribution
from odin_tpu.bay.distributions import Distribution

__all__ = [
    "DistributionDense", "MixtureDensityNetwork", "DenseDeterministic",
    "NormalLatents", "MVNDiagLatents",
]


class DistributionDense(nn.Module):
  """Dense(params_size) -> distribution builder.

  Attributes:
    event_shape: shape of one event (e.g. ``(32,)`` latents, ``(28,28,1)``
      images).
    posterior: alias string into the distribution registry.
    posterior_kwargs: extra kwargs for the builder (e.g. n_components).
    projection: if False the input is assumed to already be the raw params.
    dropout: dropout rate on the raw params during training.
  """

  event_shape: Tuple[int, ...] = ()
  posterior: str = "normal"
  posterior_kwargs: Optional[Dict[str, Any]] = None
  projection: bool = True
  dropout: float = 0.0
  use_bias: bool = True
  autoregressive: bool = False  # MADE-style masked projection (ref :213)

  @property
  def spec(self) -> DistSpec:
    return parse_distribution(self.posterior)

  @property
  def event_size(self) -> int:
    return int(np.prod(self.event_shape)) if len(self.event_shape) else 1

  @property
  def params_size(self) -> int:
    kw = self.posterior_kwargs or {}
    return int(self.spec.params_size(self.event_size, **kw))

  @property
  def prior(self) -> Optional[Distribution]:
    kw = self.posterior_kwargs or {}
    return self.spec.default_prior(tuple(self.event_shape), **kw)

  @nn.compact
  def __call__(self, x, training: bool = False) -> Distribution:
    kw = self.posterior_kwargs or {}
    if self.projection:
      if self.autoregressive:
        from odin_tpu.bay.layers.autoregressive import AutoregressiveDense
        per_dim = self.params_size // self.event_size
        if per_dim * self.event_size != self.params_size:
          raise ValueError(
              f"autoregressive head needs params_size divisible by "
              f"event_size ({self.params_size} / {self.event_size})")
        params = AutoregressiveDense(params=per_dim,
                                     event_size=self.event_size,
                                     hidden_units=(self.params_size,),
                                     use_bias=self.use_bias,
                                     name="projection")(x)
      else:
        params = nn.Dense(self.params_size, use_bias=self.use_bias,
                          name="projection")(x)
    else:
      params = x
    if self.dropout > 0:
      params = nn.Dropout(self.dropout, deterministic=not training)(params)
    return self.spec.builder(params, tuple(self.event_shape), **kw)


class MixtureDensityNetwork(DistributionDense):
  """Gaussian mixture head (reference ``dense_distribution.py:464``)."""

  posterior: str = "gmmdiag"

  @classmethod
  def create(cls, units: int, n_components: int = 2, covariance: str = "diag",
             **kwargs):
    alias = {"diag": "gmmdiag", "none": "gmmdiag", "tril": "gmmtril",
             "full": "gmmtril"}[covariance]
    return cls(event_shape=(int(units),), posterior=alias,
               posterior_kwargs={"n_components": int(n_components)}, **kwargs)


class MixtureMassNetwork(DistributionDense):
  """Mixture of negative binomials head for count data (scVI-style;
  reference ``dense_distribution.py:565``)."""

  posterior: str = "mixnb"

  @classmethod
  def create(cls, units: int, n_components: int = 2,
             zero_inflated: bool = False,
             mean_activation: str = "softplus", **kwargs):
    return cls(event_shape=(int(units),),
               posterior="mixzinb" if zero_inflated else "mixnb",
               posterior_kwargs={"n_components": int(n_components),
                                 "mean_activation": mean_activation},
               **kwargs)


class DenseDeterministic(DistributionDense):
  """Deterministic (point-mass) head — the autoencoder baseline
  (reference ``dense_distribution.py:625``)."""

  posterior: str = "vdeterministic"


class NormalLatents(DistributionDense):
  """Independent-Normal latent head shortcut."""

  posterior: str = "normal"


class MVNDiagLatents(DistributionDense):
  """MVN-diag latent head shortcut (reference ``bay/layers/latents.py:23``)."""

  posterior: str = "mvndiag"


class MixtureNormalLatents(MixtureDensityNetwork):
  """GMM latent head, per-dim (covariance 'none') mixture
  (reference ``bay/layers/latents.py:71``).  Build with
  ``MixtureNormalLatents.create(units, n_components)``."""

  posterior: str = "gmmdiag"


class MixtureMVNDiagLatents(MixtureDensityNetwork):
  """GMM latent head with diagonal-covariance components
  (reference ``bay/layers/latents.py:88``)."""

  posterior: str = "gmmdiag"


def merge_normal(q_e, q_d):
  """Precision-weighted merge of two factorized Gaussians — the LVAE
  posterior combination (reference `MergeNormal`,
  ``hierarchical_vae.py:101``; Sønderby'16): precision = 1/var_e + 1/var_d,
  mu = (mu_e/var_e + mu_d/var_d) / precision."""
  import jax.numpy as jnp

  from odin_tpu.bay.distributions.continuous import Normal
  var_e = q_e.variance()
  var_d = q_d.variance()
  prec = 1.0 / var_e + 1.0 / var_d
  loc = (q_e.mean() / var_e + q_d.mean() / var_d) / prec
  return Normal(loc, jnp.sqrt(1.0 / prec))


class MergeNormal(nn.Module):
  """Layer form of `merge_normal` (reference ``hierarchical_vae.py:101``)."""

  def __call__(self, dists, training: bool = False):
    q_e, q_d = dists
    return merge_normal(q_e, q_d)


class DistributionNetwork(nn.Module):
  """Sequential trunk + one-or-more distribution heads (reference
  `DistributionNetwork`, ``dense_distribution.py:664``): calling it
  returns one Distribution per head."""

  network: Any
  distributions: Tuple[Any, ...] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    h = self.network(x, training=training)
    outs = tuple(head(h, training=training) for head in self.distributions)
    return outs[0] if len(outs) == 1 else outs


__all__ += ["merge_normal", "MergeNormal", "DistributionNetwork",
            "MixtureNormalLatents", "MixtureMVNDiagLatents"]
