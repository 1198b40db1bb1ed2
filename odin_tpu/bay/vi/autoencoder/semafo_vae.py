"""SemafoVAE family — semi-supervised VAEs with a mutual-information
regularizer between prior samples and predicted factors.

Reference: ``odin/bay/vi/autoencoder/semafo_vae.py:35-621`` — `SemafoBase`
(labels head p(y|z) on the latents, mi_coef interpolated 0.1 -> 0.05 over
20k steps, `steps_without_mi` warmup), `_mi_loss` (:147-203): sample the
prior, decode, re-encode, and penalize D_kl(q(y|z~)||p(y|z)) (or reversed
for Remafo); `SemafoVAE` (:108), `RemafoVAE` (:239) and single-letter
variants semafod/h/s/sm/sc/p/t (:252-604, small architectural tweaks on the
same objective — represented here as subclasses with their distinguishing
hyperparameters).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from odin_tpu.backend.interpolation import Interpolation, linear
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import AnnealingVAE
from odin_tpu.bay.vi.autoencoder.multitask_vae import (
    _unpack_ssl,
    masked_mean_llk,
)

__all__ = [
    "SemafoVAE", "RemafoVAE", "semafod", "semafoh", "semafos", "semafosm",
    "semafosc", "semafop", "semafot",
]


class SemafoVAE(AnnealingVAE):
  """Semaphore VAE: `mi_coef` controls the q(y|z)/p(y|z) agreement on prior
  samples.  For MNIST mi_coef in [0.1, 0.5]; 0.1 tested for dSprites/
  Shapes3D/CelebA (reference docstring, ``semafo_vae.py:108-145``)."""

  def __init__(self,
               labels: Optional[RVconf] = None,
               alpha: float = 10.0,
               mi_coef: Union[float, Interpolation] = None,
               reverse_mi: bool = False,
               steps_without_mi: int = 1000,
               **kwargs):
    if labels is None:
      labels = RVconf(10, "onehot", projection=True, name="digits")
    if mi_coef is None:
      mi_coef = linear(vmin=0.1, vmax=0.05, steps=20000)
    self._mi_coef = mi_coef
    self.alpha = float(alpha)
    self.reverse_mi = bool(reverse_mi)
    self.steps_without_mi = int(steps_without_mi)
    self.skip_decoder = True  # labels head attaches to the latents
    kwargs["labels"] = labels
    super().__init__(**kwargs)

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  def mi_coef(self, step):
    if isinstance(self._mi_coef, Interpolation):
      s = jnp.maximum(0.0, jnp.asarray(step, jnp.float32) -
                      self.steps_without_mi)
      return self._mi_coef(s)
    return jnp.asarray(self._mi_coef, jnp.float32)

  def predict_factors(self, params, z, rng, training=False, mutables=None):
    """p(y|z) (reference ``semafo_vae.py:70-86``)."""
    return self._apply(params, "predict_labels", z, rng=rng,
                       training=training, mutables=mutables)

  def _mi_loss(self, params, qz, py_z, rng, step, training, mutables):
    """Reference ``semafo_vae.py:147-203``."""
    k1, k2, k3 = jax.random.split(rng, 3)
    batch = qz.batch_shape[0]
    z_prime = self.latents_prior.sample(k1, (batch,))
    px = self._apply(params, "decode", z_prime, rng=k2, training=training,
                     mutables=mutables)
    x_tilde = px.mean()
    qz_prime = self._apply(params, "encode", x_tilde, rng=k2,
                           training=training, mutables=mutables)
    z_tilde = qz_prime.sample(k3)
    qy_z = self.predict_factors(params, z_tilde, k2, training, mutables)
    if self.reverse_mi:  # D_kl(p(y|z) || q(y|z))
      y_s = jax.lax.stop_gradient(py_z.sample(k3))
      dkl = py_z.log_prob(y_s) - qy_z.log_prob(y_s)
    else:  # D_kl(q(y|z) || p(y|z))
      y_s = jax.lax.stop_gradient(qy_z.sample(k3))
      dkl = qy_z.log_prob(y_s) - py_z.log_prob(y_s)
    mi_y = jnp.mean(dkl)
    if training:
      # no MI gradient during warmup (the value still logs)
      mi_y = jnp.where(step >= self.steps_without_mi, mi_y,
                       jax.lax.stop_gradient(mi_y))
    else:
      mi_y = jax.lax.stop_gradient(mi_y)
    mi_y = self.mi_coef(step) * mi_y
    mi_z = jnp.clip(jax.lax.stop_gradient(
        jnp.mean(qz_prime.log_prob(z_prime))), -1e8, 1e8)
    return mi_y, mi_z

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2 = jax.random.split(rng)
    llk, kl, aux = super().elbo_components(params, x, k1, step,
                                           training=training,
                                           mutables=mutables)
    z = aux["z"]
    py_z = self.predict_factors(params, z, k1, training, mutables)
    aux["qy"] = py_z
    mi_y, mi_z = self._mi_loss(params, aux["qz"], py_z, k2, step, training,
                               mutables)
    # metric keys carry the labels head's name (reference
    # ``semafo_vae.py:218-233``: f'mi_{self.labels.name}')
    name = self.labels_conf.name if self.labels_conf is not None else "labels"
    llk[f"mi_{name}"] = mi_y * jnp.ones(z.shape[0])
    llk["mi_latents"] = mi_z * jnp.zeros(z.shape[0])  # monitoring only
    if y is not None:
      llk[f"llk_{name}"] = masked_mean_llk(self.alpha * py_z.log_prob(y),
                                           mask)
    return llk, kl, aux


class RemafoVAE(SemafoVAE):
  """SemafoVAE with reversed MI KL: minimize D_kl(p(y|z)||q(y|z))
  (reference ``semafo_vae.py:239``)."""

  def __init__(self, **kwargs):
    kwargs.pop("reverse_mi", None)
    super().__init__(reverse_mi=True, **kwargs)


class semafod(SemafoVAE):
  """Semafo with doubled latent capacity for the label-aligned subspace
  (reference ``semafo_vae.py:252``)."""

  def __init__(self, latents: Optional[RVconf] = None, **kwargs):
    if latents is None:
      latents = RVconf(42, "mvndiag", projection=True, name="latents")
    super().__init__(latents=latents, **kwargs)


class semafoh(semafod):
  """Reference ``semafo_vae.py:390``."""


class semafos(SemafoVAE):
  """Semafo with stronger supervised coefficient
  (reference ``semafo_vae.py:415``)."""

  def __init__(self, alpha: float = 20.0, **kwargs):
    kwargs.pop("alpha", None)
    super().__init__(alpha=alpha, **kwargs)


class semafosm(semafos):
  """Reference ``semafo_vae.py:485``."""


class semafosc(semafos):
  """Reference ``semafo_vae.py:502``."""


class semafop(SemafoVAE):
  """Semafo with constant mi_coef (reference ``semafo_vae.py:525``)."""

  def __init__(self, mi_coef: float = 0.1, **kwargs):
    kwargs.pop("mi_coef", None)
    super().__init__(mi_coef=float(mi_coef), **kwargs)


class semafot(SemafoVAE):
  """Semafo with extended MI warmup (reference ``semafo_vae.py:576``)."""

  def __init__(self, steps_without_mi: int = 5000, **kwargs):
    kwargs.pop("steps_without_mi", None)
    super().__init__(steps_without_mi=steps_without_mi, **kwargs)
