"""Hyperspherical distributions: von Mises-Fisher, Power Spherical, uniform.

Used by `HypersphericalVAE` / `PowersphericalVAE`
(reference ``odin/bay/vi/autoencoder/hyperbolic_vae.py:48,101``, which lean on
TFP's VonMisesFisher and the PowerSpherical paper of De Cao & Aziz 2020).
Implemented natively:  vMF sampling via Wood's (1994) rejection-free envelope
through `while_loop`-free inverse-CDF approximation is messy, so we use the
standard rejection scheme wrapped in `jax.lax.while_loop` (compiles on TPU),
and PowerSpherical — which was *designed* to avoid rejection sampling — the
idiomatic TPU choice.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from odin_tpu.bay.distributions.base import Distribution, register_kl

__all__ = ["SphericalUniform", "VonMisesFisher", "PowerSpherical"]


def _log_surface_sphere(d: int):
  # log area of S^{d-1} in R^d (math.lgamma: stays a python float under jit)
  return math.log(2.0) + (d / 2.0) * math.log(math.pi) - math.lgamma(d / 2.0)


class SphericalUniform(Distribution):
  """Uniform on the unit sphere S^{d-1} in R^d."""

  _params = ()
  _static = ("dimension", "_batch_shape")

  def __init__(self, dimension: int, batch_shape=()):
    self.dimension = int(dimension)
    self._batch_shape = tuple(batch_shape)

  @property
  def batch_shape(self):
    return self._batch_shape

  @property
  def event_shape(self):
    return (self.dimension,)

  def sample(self, seed, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape + (self.dimension,)
    x = jax.random.normal(seed, shape)
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

  def log_prob(self, x):
    lp = -_log_surface_sphere(self.dimension)
    return jnp.full(jnp.shape(x)[:-1], lp)

  def mean(self):
    return jnp.zeros(self.batch_shape + (self.dimension,))

  def entropy(self):
    return jnp.full(self.batch_shape, _log_surface_sphere(self.dimension))


def _log_iv_bessel(nu, kappa):
  """log I_nu(kappa), stable for large kappa via uniform asymptotic expansion."""
  # For the normalizer we use the scaled Bessel: log Cp(k) needs log I_nu(k).
  # Use the large-argument asymptotic blended with a series for small kappa.
  kappa = jnp.asarray(kappa)
  # series: I_nu(k) = (k/2)^nu / Gamma(nu+1) * sum_j (k^2/4)^j / (j! (nu+1)_j)
  def series(k):
    # clamp to the switch point so the large-kappa branch of the outer
    # jnp.where never sees inf/NaN from an overflowing series
    k = jnp.minimum(k, 20.0)
    log_base = nu * (jnp.log(k) - math.log(2.0)) - gammaln(nu + 1.0)
    s = jnp.ones_like(k)
    acc = jnp.ones_like(k)
    for j in range(1, 40):
      acc = acc * (k * k / 4.0) / (j * (nu + j))
      s = s + acc
    return log_base + jnp.log(s)

  def asymptotic(k):
    # uniform asymptotic (Abramowitz & Stegun 9.7.7)
    eta = jnp.sqrt(nu * nu + k * k)
    return (eta - nu * jnp.log((nu + eta) / k) -
            0.5 * jnp.log(2.0 * math.pi * eta)
            ) if nu > 0 else (k - 0.5 * jnp.log(2.0 * math.pi * k))

  small = series(jnp.maximum(kappa, 1e-6))
  large = asymptotic(jnp.maximum(kappa, 1e-6))
  return jnp.where(kappa < 20.0, small, large)


class VonMisesFisher(Distribution):
  """vMF(mean_direction mu, concentration kappa) on S^{d-1}."""

  _params = ("mean_direction", "concentration")

  def __init__(self, mean_direction, concentration):
    self.mean_direction = jnp.asarray(mean_direction)
    self.concentration = jnp.asarray(concentration)

  @property
  def batch_shape(self):
    return jnp.shape(self.mean_direction)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.mean_direction)[-1:]

  def _log_normalizer(self):
    d = self.event_shape[0]
    nu = d / 2.0 - 1.0
    k = jnp.maximum(self.concentration, 1e-8)
    return (nu * jnp.log(k) - (d / 2.0) * math.log(2.0 * math.pi) -
            _log_iv_bessel(nu, k))

  def log_prob(self, x):
    dot = jnp.sum(self.mean_direction * x, axis=-1)
    return self.concentration * dot + self._log_normalizer()

  def _sample_w(self, seed, shape):
    """Sample the cosine of the angle to mu via Wood's rejection scheme.

    The rejection loop is not reverse-differentiable; inputs and output are
    stop-gradient'd, so pathwise gradients flow only through the tangent
    direction and mean direction (kappa still receives gradient through the
    analytic KL used by HypersphericalVAE).
    """
    d = self.event_shape[0]
    k = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.maximum(self.concentration, 1e-8), shape))
    dim = d - 1.0
    b = dim / (jnp.sqrt(4.0 * k * k + dim * dim) + 2.0 * k)
    a = (dim + 2.0 * k + jnp.sqrt(4.0 * k * k + dim * dim)) / 4.0
    dterm = 4.0 * a * b / (1.0 + b) - dim * jnp.log(dim)

    def cond(state):
      _, _, accepted, it = state
      return jnp.logical_and(~jnp.all(accepted), it < 100)

    def body(state):
      key, w, accepted, it = state
      key, k1, k2 = jax.random.split(key, 3)
      eps = jax.random.beta(k1, dim / 2.0, dim / 2.0, shape)
      u = jax.random.uniform(k2, shape, minval=1e-10)
      w_new = (1.0 - (1.0 + b) * eps) / (1.0 - (1.0 - b) * eps)
      t = 2.0 * a * b / (1.0 - (1.0 - b) * eps)
      accept_new = (dim * jnp.log(t) - t + dterm) >= jnp.log(u)
      w = jnp.where(accepted, w, jnp.where(accept_new, w_new, w))
      return key, w, jnp.logical_or(accepted, accept_new), it + 1

    init = (seed, jnp.zeros(shape), jnp.zeros(shape, bool), 0)
    _, w, _, _ = jax.lax.while_loop(cond, body, init)
    return jax.lax.stop_gradient(w)

  def sample(self, seed, sample_shape=()):
    d = self.event_shape[0]
    shape = tuple(sample_shape) + self.batch_shape
    k1, k2 = jax.random.split(seed)
    w = self._sample_w(k1, shape)  # cos angle
    # tangent direction uniform on S^{d-2} orthogonal to mu
    v = jax.random.normal(k2, shape + (d,))
    mu = jnp.broadcast_to(self.mean_direction, shape + (d,))
    v = v - jnp.sum(v * mu, -1, keepdims=True) * mu
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return w[..., None] * mu + jnp.sqrt(jnp.maximum(1.0 - w[..., None] ** 2, 0.0)) * v

  def mean(self):
    # mean resultant direction: A_d(kappa) * mu with A_d = I_{d/2}/I_{d/2-1}
    d = self.event_shape[0]
    k = jnp.maximum(self.concentration, 1e-8)
    nu = d / 2.0 - 1.0
    A = jnp.exp(_log_iv_bessel(nu + 1.0, k) - _log_iv_bessel(nu, k))
    return A[..., None] * self.mean_direction

  def entropy(self):
    d = self.event_shape[0]
    k = jnp.maximum(self.concentration, 1e-8)
    nu = d / 2.0 - 1.0
    A = jnp.exp(_log_iv_bessel(nu + 1.0, k) - _log_iv_bessel(nu, k))
    return -self._log_normalizer() - k * A


@register_kl(VonMisesFisher, SphericalUniform)
def _kl_vmf_uniform(q: VonMisesFisher, p: SphericalUniform):
  return -q.entropy() + _log_surface_sphere(p.dimension)


class PowerSpherical(Distribution):
  """Power Spherical distribution (De Cao & Aziz 2020): density
  proportional to (1 + mu^T x)^kappa — closed-form, rejection-free sampling,
  the TPU-friendly alternative to vMF."""

  _params = ("mean_direction", "concentration")

  def __init__(self, mean_direction, concentration):
    self.mean_direction = jnp.asarray(mean_direction)
    self.concentration = jnp.asarray(concentration)

  @property
  def batch_shape(self):
    return jnp.shape(self.mean_direction)[:-1]

  @property
  def event_shape(self):
    return jnp.shape(self.mean_direction)[-1:]

  def _log_normalizer(self):
    d = self.event_shape[0]
    k = self.concentration
    alpha = (d - 1.0) / 2.0 + k
    beta = (d - 1.0) / 2.0
    return -((alpha + beta) * math.log(2.0) + gammaln(alpha) -
             gammaln(alpha + beta) + beta * math.log(math.pi))

  def log_prob(self, x):
    dot = jnp.sum(self.mean_direction * x, axis=-1)
    return self._log_normalizer() + self.concentration * jnp.log1p(dot)

  def sample(self, seed, sample_shape=()):
    d = self.event_shape[0]
    shape = tuple(sample_shape) + self.batch_shape
    k1, k2 = jax.random.split(seed)
    alpha = (d - 1.0) / 2.0 + jnp.broadcast_to(self.concentration, shape)
    beta = (d - 1.0) / 2.0 * jnp.ones(shape)
    z = jax.random.beta(k1, alpha, beta, shape)
    t = 2.0 * z - 1.0
    v = jax.random.normal(k2, shape + (d - 1,))
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    y = jnp.concatenate([t[..., None],
                         jnp.sqrt(jnp.maximum(1.0 - t[..., None] ** 2, 0.0)) * v],
                        axis=-1)
    # Householder reflection taking e1 onto mu
    mu = jnp.broadcast_to(self.mean_direction, shape + (d,))
    e1 = jnp.zeros_like(mu).at[..., 0].set(1.0)
    u = e1 - mu
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    return y - 2.0 * jnp.sum(y * u, -1, keepdims=True) * u

  def mean(self):
    d = self.event_shape[0]
    k = self.concentration
    alpha = (d - 1.0) / 2.0 + k
    beta = (d - 1.0) / 2.0
    return ((alpha - beta) / (alpha + beta))[..., None] * self.mean_direction

  def entropy(self):
    d = self.event_shape[0]
    k = self.concentration
    alpha = (d - 1.0) / 2.0 + k
    beta = (d - 1.0) / 2.0
    from jax.scipy.special import digamma
    return -(self._log_normalizer() +
             k * (math.log(2.0) + digamma(alpha) - digamma(alpha + beta)))


@register_kl(PowerSpherical, SphericalUniform)
def _kl_powerspherical_uniform(q: PowerSpherical, p: SphericalUniform):
  return -q.entropy() + _log_surface_sphere(p.dimension)
