"""String alias registry: alias -> (params_size, builder, default prior).

Reference: ``odin/bay/distribution_alias.py:118`` (`parse_distribution`) maps
~40 aliases to (DistributionLambda layer, Distribution) pairs.  Here each
alias resolves to a `DistSpec` with:

  * ``params_size(event_size, **kw)`` — number of raw network outputs needed,
  * ``builder(params, event_shape, **kw)`` — raw outputs -> Distribution
    (an Independent over the event dims, TFP-head semantics),
  * ``default_prior(event_shape, **kw)`` — the prior family the reference
    attaches in ``odin/bay/random_variable.py:47-157``.

All builders are pure jnp functions, traceable under jit.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay import distributions as D

__all__ = ["DistSpec", "parse_distribution", "register_distribution_alias"]


def _softplus(x, eps=1e-5):
  return jax.nn.softplus(x) + eps


def _size(event_shape) -> int:
  return int(np.prod(event_shape)) if len(event_shape) else 1


def _reshape_event(x, event_shape):
  return x.reshape(x.shape[:-1] + tuple(event_shape))


def _indep(dist, event_shape):
  return D.Independent(dist, len(event_shape)) if len(event_shape) else dist


@dataclass(frozen=True)
class DistSpec:
  name: str
  params_size: Callable[..., int]
  builder: Callable[..., D.Distribution]
  default_prior: Callable[..., Optional[D.Distribution]]


_ALIASES: Dict[str, DistSpec] = {}


def register_distribution_alias(names, spec: DistSpec):
  for n in (names if isinstance(names, (tuple, list)) else [names]):
    _ALIASES[n.lower()] = spec


def parse_distribution(alias) -> DistSpec:
  """Resolve a string alias (or DistSpec) to its DistSpec."""
  if isinstance(alias, DistSpec):
    return alias
  key = str(alias).lower()
  if key not in _ALIASES:
    raise ValueError(f"unknown distribution alias '{alias}'; "
                     f"available: {sorted(_ALIASES)}")
  return _ALIASES[key]


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------
def _split(params, n, event_shape):
  """Split trailing axis into n event-shaped chunks."""
  d = _size(event_shape)
  return [_reshape_event(params[..., i * d:(i + 1) * d], event_shape)
          for i in range(n)]


def _normal_builder(params, event_shape, **kw):
  loc, raw = _split(params, 2, event_shape)
  return _indep(D.Normal(loc, _softplus(raw)), event_shape)


def _lognormal_builder(params, event_shape, **kw):
  loc, raw = _split(params, 2, event_shape)
  return _indep(D.LogNormal(loc, _softplus(raw)), event_shape)


def _mvndiag_builder(params, event_shape, **kw):
  d = _size(event_shape)
  loc, raw = params[..., :d], params[..., d:]
  return D.MultivariateNormalDiag(loc, _softplus(raw))


def _mvntril_builder(params, event_shape, **kw):
  d = _size(event_shape)
  loc = params[..., :d]
  raw = params[..., d:]
  tril = jnp.zeros(params.shape[:-1] + (d, d), params.dtype)
  idx = jnp.tril_indices(d)
  tril = tril.at[..., idx[0], idx[1]].set(raw)
  diag = jnp.diagonal(tril, axis1=-2, axis2=-1)
  tril = tril - jnp.einsum("...i,ij->...ij", diag, jnp.eye(d, dtype=params.dtype)) \
      + jnp.einsum("...i,ij->...ij", _softplus(diag), jnp.eye(d, dtype=params.dtype))
  return D.MultivariateNormalTriL(loc, tril)


def _gamma_builder(params, event_shape, **kw):
  conc, rate = _split(params, 2, event_shape)
  return _indep(D.Gamma(_softplus(conc), _softplus(rate)), event_shape)


def _beta_builder(params, event_shape, **kw):
  c1, c0 = _split(params, 2, event_shape)
  return _indep(D.Beta(_softplus(c1), _softplus(c0)), event_shape)


def _dirichlet_builder(params, event_shape, **kw):
  conc = _reshape_event(params, event_shape)
  return D.Dirichlet(_softplus(conc))


def _bernoulli_builder(params, event_shape, **kw):
  return _indep(D.Bernoulli(logits=_reshape_event(params, event_shape)), event_shape)


def _cbernoulli_builder(params, event_shape, **kw):
  return _indep(D.ContinuousBernoulli(logits=_reshape_event(params, event_shape)),
                event_shape)


def _zibernoulli_builder(params, event_shape, **kw):
  logits, gate = _split(params, 2, event_shape)
  return _indep(D.ZeroInflated(D.Bernoulli(logits=logits), logits=gate), event_shape)


def _relaxedbernoulli_builder(params, event_shape, temperature=0.5, **kw):
  return _indep(
      D.RelaxedBernoulli(jnp.asarray(temperature), logits=_reshape_event(params, event_shape)),
      event_shape)


def _onehot_builder(params, event_shape, **kw):
  return D.OneHotCategorical(logits=_reshape_event(params, event_shape))


def _categorical_builder(params, event_shape, **kw):
  return D.Categorical(logits=_reshape_event(params, event_shape))


def _relaxedonehot_builder(params, event_shape, temperature=0.5, **kw):
  return D.RelaxedOneHotCategorical(jnp.asarray(temperature),
                                    logits=_reshape_event(params, event_shape))


def _poisson_builder(params, event_shape, **kw):
  return _indep(D.Poisson(log_rate=_reshape_event(params, event_shape)), event_shape)


def _zipoisson_builder(params, event_shape, **kw):
  log_rate, gate = _split(params, 2, event_shape)
  return _indep(D.ZeroInflated(D.Poisson(log_rate=log_rate), logits=gate), event_shape)


def _nb_builder(params, event_shape, dispersion: str = "full", **kw):
  count, logits = _split(params, 2, event_shape)
  return _indep(D.NegativeBinomial(_softplus(count), logits=logits), event_shape)


def _zinb_builder(params, event_shape, **kw):
  count, logits, gate = _split(params, 3, event_shape)
  return _indep(
      D.ZeroInflated(D.NegativeBinomial(_softplus(count), logits=logits), logits=gate),
      event_shape)


def _nbd_builder(params, event_shape, **kw):
  loc, disp = _split(params, 2, event_shape)
  return _indep(D.NegativeBinomialDisp(_softplus(loc), _softplus(disp)), event_shape)


def _zinbd_builder(params, event_shape, **kw):
  loc, disp, gate = _split(params, 3, event_shape)
  return _indep(
      D.ZeroInflated(D.NegativeBinomialDisp(_softplus(loc), _softplus(disp)), logits=gate),
      event_shape)


def _binomial_builder(params, event_shape, total_count=1.0, **kw):
  return _indep(D.Binomial(jnp.asarray(total_count),
                           logits=_reshape_event(params, event_shape)), event_shape)


def _multinomial_builder(params, event_shape, total_count=1.0, **kw):
  return D.Multinomial(jnp.asarray(total_count),
                       logits=_reshape_event(params, event_shape))


def _dirimultinomial_builder(params, event_shape, total_count=1.0, **kw):
  return D.DirichletMultinomial(jnp.asarray(total_count),
                                _softplus(_reshape_event(params, event_shape)))


def _deterministic_builder(params, event_shape, **kw):
  return _indep(D.Deterministic(_reshape_event(params, event_shape)), event_shape)


def _vdeterministic_builder(params, event_shape, **kw):
  return D.VectorDeterministic(_reshape_event(params, event_shape))


def _gmm_params_size(event_size, n_components=2, covariance="diag", **kw):
  if covariance in ("diag", "none"):
    return n_components * (1 + 2 * event_size)
  if covariance in ("tril", "full"):
    return n_components * (1 + event_size + event_size * (event_size + 1) // 2)
  raise ValueError(covariance)


def _gmm_builder(params, event_shape, n_components=2, covariance="diag", **kw):
  d = _size(event_shape)
  K = n_components
  logits = params[..., :K]
  rest = params[..., K:]
  if covariance in ("diag", "none"):
    locs = rest[..., :K * d].reshape(rest.shape[:-1] + (K, d))
    scales = _softplus(rest[..., K * d:].reshape(rest.shape[:-1] + (K, d)))
    return D.GaussianMixture(logits, locs, scales, covariance="diag")
  m = d * (d + 1) // 2
  locs = rest[..., :K * d].reshape(rest.shape[:-1] + (K, d))
  raw = rest[..., K * d:].reshape(rest.shape[:-1] + (K, m))
  tril = jnp.zeros(raw.shape[:-1] + (d, d), params.dtype)
  idx = jnp.tril_indices(d)
  tril = tril.at[..., idx[0], idx[1]].set(raw)
  diag = jnp.diagonal(tril, axis1=-2, axis2=-1)
  eye = jnp.eye(d, dtype=params.dtype)
  tril = tril + jnp.einsum("...i,ij->...ij", _softplus(diag) - diag, eye)
  return D.GaussianMixture(logits, locs, tril, covariance="tril")


def _mixqlogistic_params_size(event_size, n_components=10, **kw):
  return n_components * (1 + 2 * event_size)


def _mixqlogistic_builder(params, event_shape, n_components=10, low=0, high=255, **kw):
  d = _size(event_shape)
  K = n_components
  logits = params[..., :K]
  rest = params[..., K:]
  locs = rest[..., :K * d].reshape(rest.shape[:-1] + (K,) + tuple(event_shape))
  scales = _softplus(rest[..., K * d:].reshape(rest.shape[:-1] + (K,) + tuple(event_shape)))
  comp = D.QuantizedLogistic(jax.nn.sigmoid(locs) * (high - low) + low,
                             scales * (high - low), low=low, high=high,
                             inputs_domain="sigmoid")
  return D.MixtureSameFamily(D.Categorical(logits=logits),
                             _indep(comp, event_shape))


def _vmf_builder(params, event_shape, **kw):
  d = _size(event_shape)
  loc = params[..., :d]
  loc = loc / jnp.maximum(jnp.linalg.norm(loc, axis=-1, keepdims=True), 1e-8)
  kappa = _softplus(params[..., d]) + 1.0
  return D.VonMisesFisher(loc, kappa)


def _powerspherical_builder(params, event_shape, **kw):
  d = _size(event_shape)
  loc = params[..., :d]
  loc = loc / jnp.maximum(jnp.linalg.norm(loc, axis=-1, keepdims=True), 1e-8)
  kappa = _softplus(params[..., d]) + 1.0
  return D.PowerSpherical(loc, kappa)


# ---------------------------------------------------------------------------
# default priors (reference odin/bay/random_variable.py:47-157)
# ---------------------------------------------------------------------------
def _std_normal_prior(event_shape, **kw):
  d = _size(event_shape)
  return _indep(D.Normal(jnp.zeros(event_shape), jnp.ones(event_shape)), event_shape)


def _mvndiag_prior(event_shape, **kw):
  d = _size(event_shape)
  return D.MultivariateNormalDiag(jnp.zeros(d), jnp.ones(d))


def _dirichlet_prior(event_shape, **kw):
  return D.Dirichlet(jnp.ones(event_shape))


def _onehot_prior(event_shape, **kw):
  d = _size(event_shape)
  return D.OneHotCategorical(logits=jnp.zeros(d))


def _sphere_prior(event_shape, **kw):
  return D.SphericalUniform(_size(event_shape))


def _no_prior(event_shape, **kw):
  return None


# ---------------------------------------------------------------------------
# registry table
# ---------------------------------------------------------------------------
def _n_params(n):
  return lambda event_size, **kw: n * event_size


register_distribution_alias(("normal", "gaussian"), DistSpec(
    "normal", _n_params(2), _normal_builder, _std_normal_prior))
register_distribution_alias("lognormal", DistSpec(
    "lognormal", _n_params(2), _lognormal_builder, _std_normal_prior))
register_distribution_alias("mvndiag", DistSpec(
    "mvndiag", _n_params(2), _mvndiag_builder, _mvndiag_prior))
register_distribution_alias("mvntril", DistSpec(
    "mvntril", lambda d, **kw: d + d * (d + 1) // 2, _mvntril_builder, _mvndiag_prior))
register_distribution_alias("mvnfull", DistSpec(
    "mvnfull", lambda d, **kw: d + d * (d + 1) // 2, _mvntril_builder, _mvndiag_prior))
register_distribution_alias("gamma", DistSpec(
    "gamma", _n_params(2), _gamma_builder, _no_prior))
register_distribution_alias("beta", DistSpec(
    "beta", _n_params(2), _beta_builder, _no_prior))
register_distribution_alias("dirichlet", DistSpec(
    "dirichlet", _n_params(1), _dirichlet_builder, _dirichlet_prior))
register_distribution_alias("bernoulli", DistSpec(
    "bernoulli", _n_params(1), _bernoulli_builder, _no_prior))
register_distribution_alias("cbernoulli", DistSpec(
    "cbernoulli", _n_params(1), _cbernoulli_builder, _no_prior))
register_distribution_alias(("zibernoulli", "zeroinflatedbernoulli"), DistSpec(
    "zibernoulli", _n_params(2), _zibernoulli_builder, _no_prior))
register_distribution_alias(("relaxedbern", "relaxedsigmoid", "relaxedbernoulli"), DistSpec(
    "relaxedbernoulli", _n_params(1), _relaxedbernoulli_builder, _no_prior))
register_distribution_alias(("onehot",), DistSpec(
    "onehot", _n_params(1), _onehot_builder, _onehot_prior))
register_distribution_alias(("cat", "categorical", "discrete"), DistSpec(
    "categorical", _n_params(1), _categorical_builder, _onehot_prior))
register_distribution_alias(("relaxedsoftmax", "relaxedonehot", "gumbel_softmax"), DistSpec(
    "relaxedonehot", _n_params(1), _relaxedonehot_builder, _onehot_prior))
register_distribution_alias(("pois", "poisson"), DistSpec(
    "poisson", _n_params(1), _poisson_builder, _no_prior))
register_distribution_alias(("zip", "zipois", "zipoisson", "zeroinflatedpoisson"), DistSpec(
    "zipoisson", _n_params(2), _zipoisson_builder, _no_prior))
register_distribution_alias(("nb", "negativebinomial", "nbfull", "nbshare", "nbsingle"), DistSpec(
    "nb", _n_params(2), _nb_builder, _no_prior))
register_distribution_alias(("zinb", "zinbfull", "zinbshare", "zinbsingle"), DistSpec(
    "zinb", _n_params(3), _zinb_builder, _no_prior))
register_distribution_alias(("nbd", "negativebinomialdisp", "nbdfull", "nbdshare",
                             "nbdsingle"), DistSpec(
    "nbd", _n_params(2), _nbd_builder, _no_prior))
register_distribution_alias(("zinbd", "zinbdfull", "zinbdshare", "zinbdsingle"), DistSpec(
    "zinbd", _n_params(3), _zinbd_builder, _no_prior))
register_distribution_alias("binomial", DistSpec(
    "binomial", _n_params(1), _binomial_builder, _no_prior))
register_distribution_alias("multinomial", DistSpec(
    "multinomial", _n_params(1), _multinomial_builder, _no_prior))
register_distribution_alias(("dirimultinomial", "dirichletmultinomial"), DistSpec(
    "dirimultinomial", _n_params(1), _dirimultinomial_builder, _no_prior))
register_distribution_alias("deterministic", DistSpec(
    "deterministic", _n_params(1), _deterministic_builder, _no_prior))
register_distribution_alias("vdeterministic", DistSpec(
    "vdeterministic", _n_params(1), _vdeterministic_builder, _no_prior))
register_distribution_alias(("mdn", "gmm", "mdndiag", "gmmdiag"), DistSpec(
    "gmmdiag", _gmm_params_size, _gmm_builder, _mvndiag_prior))
register_distribution_alias(("mdntril", "gmmtril", "mdnfull", "gmmfull"), DistSpec(
    "gmmtril",
    lambda d, n_components=2, **kw: _gmm_params_size(d, n_components, "tril"),
    lambda p, e, n_components=2, **kw: _gmm_builder(p, e, n_components, "tril"),
    _mvndiag_prior))
def _qlogistic_builder(params, event_shape, low=0, high=255, **kw):
  """PixelCNN-style quantized logistic: raw loc in ~[-1,1] mapped onto the
  pixel grid exactly as the reference
  (``odin/bay/distributions/quantized.py:96-102``):
  loc = low + 0.5(high-low)(loc+1), scale = softplus(raw)·0.5(high-low)."""
  loc, raw = _split(params, 2, event_shape)
  support = 0.5 * (high - low)
  loc = low + support * (loc + 1.0)
  scale = (jax.nn.softplus(raw) + math.exp(-7.0)) * support
  return _indep(
      D.QuantizedLogistic(loc, scale, low=low, high=high,
                          inputs_domain="sigmoid"), event_shape)


def _mixnb_params_size(event_size, n_components=2, zero_inflated=False, **kw):
  per = 3 if zero_inflated else 2
  return n_components * (1 + per * event_size)


def _mixnb_builder(params, event_shape, n_components=2, zero_inflated=False,
                   mean_activation="softplus", **kw):
  """Mixture of mean/dispersion negative binomials (scVI-style count heads;
  reference ``MixtureMassNetwork``, ``dense_distribution.py:565``, built on
  ``NegativeBinomialMixture``, ``distributions/mixture.py:330``)."""
  d = _size(event_shape)
  K = n_components
  logits = params[..., :K]
  rest = params[..., K:]
  act = jax.nn.softplus if mean_activation == "softplus" else getattr(
      jax.nn, mean_activation)
  loc = act(rest[..., :K * d]).reshape(rest.shape[:-1] + (K, d)) + 1e-8
  disp = _softplus(rest[..., K * d:2 * K * d]).reshape(
      rest.shape[:-1] + (K, d)) + 1e-8
  comp = D.NegativeBinomialDisp(loc, disp)
  if zero_inflated:
    zi = rest[..., 2 * K * d:].reshape(rest.shape[:-1] + (K, d))
    comp = D.ZeroInflated(comp, logits=zi)
  return D.MixtureSameFamily(D.Categorical(logits=logits),
                             D.Independent(comp, len(event_shape) or 1))


register_distribution_alias(("mixnb", "nbmixture"), DistSpec(
    "mixnb", _mixnb_params_size, _mixnb_builder, _no_prior))
register_distribution_alias(("mixzinb", "zinbmixture"), DistSpec(
    "mixzinb",
    lambda d, n_components=2, **kw: _mixnb_params_size(
        d, n_components, zero_inflated=True),
    lambda p, e, n_components=2, **kw: _mixnb_builder(
        p, e, n_components, zero_inflated=True, **kw),
    _no_prior))
register_distribution_alias(("qlogistic", "quantizedlogistic"), DistSpec(
    "qlogistic", _n_params(2), _qlogistic_builder, _no_prior))
register_distribution_alias(("mixqlogist", "mixqlogistic"), DistSpec(
    "mixqlogistic", _mixqlogistic_params_size, _mixqlogistic_builder, _no_prior))
register_distribution_alias(("vonmisesfisher", "vmf"), DistSpec(
    "vmf", lambda d, **kw: d + 1, _vmf_builder, _sphere_prior))
register_distribution_alias(("powerspherical",), DistSpec(
    "powerspherical", lambda d, **kw: d + 1, _powerspherical_builder, _sphere_prior))
