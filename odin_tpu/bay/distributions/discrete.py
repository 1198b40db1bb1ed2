"""Discrete & count distributions.

Covers the reference aliases 'bernoulli', 'cbernoulli', 'zibernoulli',
'relaxedbernoulli', 'cat'/'onehot'/'relaxedonehot', 'poisson'/'zip',
'binomial', 'multinomial', 'dirimultinomial', the NegativeBinomial family
('nb*', 'zinb*') and the mean-dispersion parameterization ('nbd*', 'zinbd*')
implemented in the reference as a custom TFP distribution
(``odin/bay/distributions/negative_binomial_disp.py:14``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, xlogy

from odin_tpu.bay.distributions.base import (
    Distribution,
    register_kl,
    _shapes_broadcast,
)

__all__ = [
    "Bernoulli", "ContinuousBernoulli", "Categorical", "OneHotCategorical",
    "RelaxedBernoulli", "RelaxedOneHotCategorical", "Poisson", "Binomial",
    "Multinomial", "DirichletMultinomial", "NegativeBinomial",
    "NegativeBinomialDisp", "ZeroInflated",
]


def _logits_from(logits, probs):
  if (logits is None) == (probs is None):
    raise ValueError("exactly one of logits/probs must be given")
  if logits is not None:
    return jnp.asarray(logits)
  probs = jnp.asarray(probs)
  return jnp.log(probs) - jnp.log1p(-probs)


def _cat_logits_from(logits, probs):
  if (logits is None) == (probs is None):
    raise ValueError("exactly one of logits/probs must be given")
  if logits is not None:
    logits = jnp.asarray(logits)
    return logits - jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
  return jnp.log(jnp.asarray(probs))


class Bernoulli(Distribution):
  _params = ("logits",)

  def __init__(self, logits=None, probs=None):
    self.logits = _logits_from(logits, probs)

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)

  @property
  def probs(self):
    return jax.nn.sigmoid(self.logits)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.bernoulli(seed, self.probs, shape).astype(jnp.float32)

  def log_prob(self, x):
    # -BCE(x, sigmoid(logits)), valid for x in [0, 1] (supports soft targets
    # exactly like tfd.Bernoulli's log_prob on float inputs).
    lp1 = -jax.nn.softplus(-self.logits)   # log sigmoid
    lp0 = -jax.nn.softplus(self.logits)    # log (1 - sigmoid)
    return x * lp1 + (1.0 - x) * lp0

  def mean(self):
    return self.probs

  def mode(self):
    return (self.logits > 0).astype(jnp.float32)

  def variance(self):
    p = self.probs
    return p * (1.0 - p)

  def entropy(self):
    p1 = -jax.nn.softplus(-self.logits)
    p0 = -jax.nn.softplus(self.logits)
    p = self.probs
    return -(p * p1 + (1.0 - p) * p0)


@register_kl(Bernoulli, Bernoulli)
def _kl_bernoulli(q: Bernoulli, p: Bernoulli):
  pq = q.probs
  lq1 = -jax.nn.softplus(-q.logits)
  lq0 = -jax.nn.softplus(q.logits)
  lp1 = -jax.nn.softplus(-p.logits)
  lp0 = -jax.nn.softplus(p.logits)
  return pq * (lq1 - lp1) + (1.0 - pq) * (lq0 - lp0)


class ContinuousBernoulli(Bernoulli):
  """Bernoulli density normalized over [0,1] (Loaiza-Ganem & Cunningham 2019);
  alias 'cbernoulli'."""

  def _log_norm_const(self):
    # C(lam) = 2 atanh(1-2lam) / (1-2lam) for lam != 0.5, else 2.
    lam = jnp.clip(self.probs, 1e-6, 1.0 - 1e-6)
    safe = jnp.where(jnp.abs(lam - 0.5) < 1e-4, 0.4999, lam)
    log_c = jnp.log(jnp.abs(2.0 * jnp.arctanh(1.0 - 2.0 * safe))) - \
        jnp.log(jnp.abs(1.0 - 2.0 * safe))
    taylor = math.log(2.0) + 4.0 / 3.0 * (lam - 0.5) ** 2
    return jnp.where(jnp.abs(lam - 0.5) < 1e-4, taylor, log_c)

  def log_prob(self, x):
    return super().log_prob(x) + self._log_norm_const()

  def mean(self):
    lam = jnp.clip(self.probs, 1e-6, 1.0 - 1e-6)
    safe = jnp.where(jnp.abs(lam - 0.5) < 1e-4, 0.4999, lam)
    m = safe / (2.0 * safe - 1.0) + 1.0 / (2.0 * jnp.arctanh(1.0 - 2.0 * safe))
    return jnp.where(jnp.abs(lam - 0.5) < 1e-4, 0.5 * jnp.ones_like(lam), m)


class Categorical(Distribution):
  """Integer-valued categorical over the last axis of `logits`."""

  _params = ("logits",)

  def __init__(self, logits=None, probs=None):
    self.logits = _cat_logits_from(logits, probs)

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)[:-1]

  @property
  def num_categories(self):
    return jnp.shape(self.logits)[-1]

  @property
  def probs(self):
    return jax.nn.softmax(self.logits, axis=-1)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.categorical(seed, self.logits, shape=shape)

  def log_prob(self, x):
    x = jnp.asarray(x, jnp.int32)
    return jnp.take_along_axis(self.logits, x[..., None], axis=-1)[..., 0]

  def mode(self):
    return jnp.argmax(self.logits, axis=-1)

  def entropy(self):
    p = self.probs
    return -jnp.sum(p * self.logits, axis=-1)


@register_kl(Categorical, Categorical)
def _kl_categorical(q: Categorical, p: Categorical):
  return jnp.sum(q.probs * (q.logits - p.logits), axis=-1)


class OneHotCategorical(Categorical):
  """One-hot-valued categorical; event_shape = (K,)."""

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.logits)[-1:]

  def sample(self, seed, sample_shape=()):
    idx = super().sample(seed, sample_shape)
    return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.float32)

  def log_prob(self, x):
    return jnp.sum(x * self.logits, axis=-1)

  def mean(self):
    return self.probs

  def mode(self):
    return jax.nn.one_hot(jnp.argmax(self.logits, -1), self.logits.shape[-1],
                          dtype=jnp.float32)

  def variance(self):
    p = self.probs
    return p * (1.0 - p)


@register_kl(OneHotCategorical, OneHotCategorical)
def _kl_onehot(q, p):
  return _kl_categorical(q, p)


class RelaxedBernoulli(Distribution):
  """Binary Concrete: sigmoid((logits + logistic noise) / temperature)."""

  _params = ("temperature", "logits")

  def __init__(self, temperature, logits=None, probs=None):
    self.temperature = jnp.asarray(temperature)
    self.logits = _logits_from(logits, probs)

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    u = jax.random.uniform(seed, shape, minval=1e-6, maxval=1.0 - 1e-6)
    logistic = jnp.log(u) - jnp.log1p(-u)
    return jax.nn.sigmoid((self.logits + logistic) / self.temperature)

  def log_prob(self, x):
    t = self.temperature
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    logit_x = jnp.log(x) - jnp.log1p(-x)
    z = self.logits - t * logit_x
    return jnp.log(t) + z - 2.0 * jax.nn.softplus(z) - jnp.log(x * (1.0 - x))

  def mean(self):
    return jax.nn.sigmoid(self.logits)  # mean of the underlying Bernoulli


class RelaxedOneHotCategorical(Distribution):
  """Gumbel-softmax / Concrete distribution; alias 'relaxedonehot'."""

  _params = ("temperature", "logits")

  def __init__(self, temperature, logits=None, probs=None):
    self.temperature = jnp.asarray(temperature)
    self.logits = _cat_logits_from(logits, probs)

  @property
  def batch_shape(self):
    return jnp.shape(self.logits)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.logits)[-1:]

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape + self.event_shape
    g = jax.random.gumbel(seed, shape)
    return jax.nn.softmax((self.logits + g) / self.temperature, axis=-1)

  def log_prob(self, x):
    K = self.logits.shape[-1]
    t = self.temperature
    logx = jnp.log(jnp.clip(x, 1e-10, 1.0))
    score = self.logits - t * logx
    return (gammaln(jnp.asarray(float(K))) + (K - 1) * jnp.log(t) +
            jnp.sum(score, axis=-1) - jnp.sum(logx, axis=-1) -
            K * jax.scipy.special.logsumexp(score, axis=-1))

  def mean(self):
    return jax.nn.softmax(self.logits, axis=-1)


class Poisson(Distribution):
  _params = ("log_rate",)

  def __init__(self, rate=None, log_rate=None):
    if (rate is None) == (log_rate is None):
      raise ValueError("exactly one of rate/log_rate")
    self.log_rate = jnp.log(jnp.asarray(rate)) if rate is not None else jnp.asarray(log_rate)

  @property
  def batch_shape(self):
    return jnp.shape(self.log_rate)

  @property
  def rate(self):
    return jnp.exp(self.log_rate)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.poisson(seed, self.rate, shape).astype(jnp.float32)

  def log_prob(self, x):
    return x * self.log_rate - self.rate - gammaln(x + 1.0)

  def mean(self):
    return self.rate

  def mode(self):
    return jnp.floor(self.rate)

  def variance(self):
    return self.rate


@register_kl(Poisson, Poisson)
def _kl_poisson(q: Poisson, p: Poisson):
  return q.rate * (q.log_rate - p.log_rate) - q.rate + p.rate


class Binomial(Distribution):
  _params = ("total_count", "logits")

  def __init__(self, total_count, logits=None, probs=None):
    self.total_count = jnp.asarray(total_count, jnp.float32)
    self.logits = _logits_from(logits, probs)

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.total_count), jnp.shape(self.logits))

  @property
  def probs(self):
    return jax.nn.sigmoid(self.logits)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.binomial(seed, jnp.broadcast_to(self.total_count, shape),
                               jnp.broadcast_to(self.probs, shape)).astype(jnp.float32)

  def log_prob(self, x):
    n = self.total_count
    log_p = -jax.nn.softplus(-self.logits)
    log_1mp = -jax.nn.softplus(self.logits)
    return (gammaln(n + 1.0) - gammaln(x + 1.0) - gammaln(n - x + 1.0) +
            x * log_p + (n - x) * log_1mp)

  def mean(self):
    return self.total_count * self.probs

  def variance(self):
    p = self.probs
    return self.total_count * p * (1.0 - p)


class Multinomial(Distribution):
  _params = ("total_count", "logits")

  def __init__(self, total_count, logits=None, probs=None):
    self.total_count = jnp.asarray(total_count, jnp.float32)
    self.logits = _cat_logits_from(logits, probs)

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.total_count),
                             jnp.shape(self.logits)[:-1])

  @property
  def event_shape(self):
    return jnp.shape(self.logits)[-1:]

  @property
  def probs(self):
    return jax.nn.softmax(self.logits, axis=-1)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    n = jnp.broadcast_to(self.total_count, shape).astype(jnp.int32)
    logits = jnp.broadcast_to(self.logits, shape + self.event_shape)
    return jax.random.multinomial(seed, n, jax.nn.softmax(logits, -1)).astype(jnp.float32)

  def log_prob(self, x):
    return (gammaln(self.total_count + 1.0) - jnp.sum(gammaln(x + 1.0), axis=-1) +
            jnp.sum(x * self.logits, axis=-1))

  def mean(self):
    return self.total_count[..., None] * self.probs if self.total_count.ndim else \
        self.total_count * self.probs

  def variance(self):
    p = self.probs
    n = self.total_count[..., None] if jnp.ndim(self.total_count) else self.total_count
    return n * p * (1.0 - p)


class DirichletMultinomial(Distribution):
  _params = ("total_count", "concentration")

  def __init__(self, total_count, concentration):
    self.total_count = jnp.asarray(total_count, jnp.float32)
    self.concentration = jnp.asarray(concentration)

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.total_count),
                             jnp.shape(self.concentration)[:-1])

  @property
  def event_shape(self):
    return jnp.shape(self.concentration)[-1:]

  def sample(self, seed, sample_shape=()):
    k1, k2 = jax.random.split(seed)
    from odin_tpu.bay.distributions.continuous import Dirichlet
    p = Dirichlet(self.concentration).sample(k1, sample_shape)
    shape = tuple(sample_shape) + self.batch_shape
    n = jnp.broadcast_to(self.total_count, shape).astype(jnp.int32)
    return jax.random.multinomial(k2, n, p).astype(jnp.float32)

  def log_prob(self, x):
    a = self.concentration
    a0 = jnp.sum(a, axis=-1)
    n = self.total_count
    return (gammaln(n + 1.0) - jnp.sum(gammaln(x + 1.0), axis=-1) +
            gammaln(a0) - gammaln(n + a0) +
            jnp.sum(gammaln(x + a) - gammaln(a), axis=-1))

  def mean(self):
    a = self.concentration
    return self.total_count[..., None] * a / jnp.sum(a, -1, keepdims=True) \
        if jnp.ndim(self.total_count) else \
        self.total_count * a / jnp.sum(a, -1, keepdims=True)


class NegativeBinomial(Distribution):
  """NB(total_count r, logits), logits = log(p/(1-p)) of success prob p.

  Mean = r p / (1-p) = r e^logits.
  """

  _params = ("total_count", "logits")

  def __init__(self, total_count, logits=None, probs=None):
    self.total_count = jnp.asarray(total_count, jnp.float32)
    self.logits = _logits_from(logits, probs)

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.total_count), jnp.shape(self.logits))

  def sample(self, seed, sample_shape=()):
    # Gamma-Poisson mixture: lambda ~ Gamma(r, (1-p)/p); x ~ Poisson(lambda)
    k1, k2 = jax.random.split(seed)
    shape = tuple(sample_shape) + self.batch_shape
    r = jnp.broadcast_to(self.total_count, shape)
    g = jax.random.gamma(k1, r) * jnp.exp(jnp.broadcast_to(self.logits, shape))
    return jax.random.poisson(k2, g).astype(jnp.float32)

  def log_prob(self, x):
    r = self.total_count
    log_p = -jax.nn.softplus(-self.logits)
    log_1mp = -jax.nn.softplus(self.logits)
    return (gammaln(x + r) - gammaln(r) - gammaln(x + 1.0) +
            r * log_1mp + x * log_p)

  def mean(self):
    return self.total_count * jnp.exp(self.logits)

  def variance(self):
    return self.mean() / jax.nn.sigmoid(-self.logits)


class NegativeBinomialDisp(Distribution):
  """Mean/dispersion NB (scVI parameterization): NB(loc, disp) with
  variance = loc + loc^2 / disp.

  Reference: ``odin/bay/distributions/negative_binomial_disp.py:14``.
  """

  _params = ("loc", "disp")

  def __init__(self, loc, disp):
    self.loc = jnp.asarray(loc)
    self.disp = jnp.asarray(disp)

  @property
  def batch_shape(self):
    return _shapes_broadcast(jnp.shape(self.loc), jnp.shape(self.disp))

  def _as_nb(self) -> NegativeBinomial:
    # r = disp; p = loc / (loc + disp)  => logits = log(loc) - log(disp)
    logits = jnp.log(jnp.maximum(self.loc, 1e-8)) - jnp.log(jnp.maximum(self.disp, 1e-8))
    return NegativeBinomial(self.disp, logits=logits)

  def sample(self, seed, sample_shape=()):
    return self._as_nb().sample(seed, sample_shape)

  def log_prob(self, x):
    mu, th = self.loc, self.disp
    eps = 1e-8
    log_th_mu = jnp.log(th + mu + eps)
    return (th * (jnp.log(th + eps) - log_th_mu) +
            x * (jnp.log(mu + eps) - log_th_mu) +
            gammaln(x + th) - gammaln(th) - gammaln(x + 1.0))

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape)

  def variance(self):
    return self.loc + self.loc ** 2 / self.disp


class ZeroInflated(Distribution):
  """Mixture of a point mass at zero and a count distribution.

  Reference: ``odin/bay/distributions/zero_inflated.py:47``.
  """

  _params = ("count_distribution", "inflated_logits")

  def __init__(self, count_distribution: Distribution,
               logits=None, probs=None):
    self.count_distribution = count_distribution
    self.inflated_logits = _logits_from(logits, probs)  # P(zero-inflation)

  @property
  def batch_shape(self):
    return _shapes_broadcast(self.count_distribution.batch_shape,
                             jnp.shape(self.inflated_logits))

  @property
  def event_shape(self):
    return self.count_distribution.event_shape

  def sample(self, seed, sample_shape=()):
    k1, k2 = jax.random.split(seed)
    x = self.count_distribution.sample(k1, sample_shape)
    gate = jax.random.bernoulli(k2, jax.nn.sigmoid(self.inflated_logits), x.shape)
    return jnp.where(gate, 0.0, x)

  def log_prob(self, x):
    log_pi = -jax.nn.softplus(-self.inflated_logits)      # log P(inflated)
    log_1mpi = -jax.nn.softplus(self.inflated_logits)     # log P(count branch)
    lp_count = self.count_distribution.log_prob(x)
    zero_case = jnp.logaddexp(log_pi, log_1mpi + self.count_distribution.log_prob(jnp.zeros_like(x)))
    nonzero_case = log_1mpi + lp_count
    return jnp.where(x == 0, zero_case, nonzero_case)

  def mean(self):
    return (1.0 - jax.nn.sigmoid(self.inflated_logits)) * self.count_distribution.mean()

  def variance(self):
    pi = jax.nn.sigmoid(self.inflated_logits)
    m = self.count_distribution.mean()
    v = self.count_distribution.variance()
    return (1 - pi) * (v + m * m) - ((1 - pi) * m) ** 2
