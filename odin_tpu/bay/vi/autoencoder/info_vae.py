"""InfoVAE / MIVAE — information-preference objectives.

Reference: ``odin/bay/vi/autoencoder/info_vae.py`` — `InfoVAE` (:29):
``ELBO = llk - beta*kl - (lamda - beta)*MMD(q(z)||p(z))``; `MIVAE` (:100):
adds a mutual-information lower bound by decode-then-re-encode of mutual
codes.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from odin_tpu.bay.distributions import MultivariateNormalDiag
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE
from odin_tpu.bay.vi.losses import maximum_mean_discrepancy

__all__ = ["InfoVAE", "MIVAE"]


class InfoVAE(BetaVAE):
  """InfoVAE (Zhao et al.): beta = 1 - alpha; the info-divergence (MMD by
  default) is weighted by (lamda - beta).  For MNIST the paper uses
  lamda=1000, alpha=0 (reference ``info_vae.py:29-95``)."""

  def __init__(self,
               alpha: float = 0.0,
               lamda: float = 100.0,
               divergence: str = "mmd",
               n_prior_samples: int = 100,
               **kwargs):
    kwargs.pop("beta", None)
    super().__init__(beta=1.0 - alpha, **kwargs)
    self.lamda = float(lamda)
    self.divergence = divergence
    self.n_prior_samples = int(n_prior_samples)

  @property
  def alpha(self):
    return 1.0 - self.beta

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    llk, kl, aux = super().elbo_components(params, batch, rng, step,
                                           training=training,
                                           mutables=mutables)
    z = aux["z"].reshape(-1, self.zdim)
    div = maximum_mean_discrepancy(aux["qz"], self.latents_prior,
                                   seed=jax.random.fold_in(rng, 17),
                                   q_samples=z,
                                   p_sample_shape=self.n_prior_samples)
    beta = self._schedule(self.beta, step)
    kl["div_latents"] = (self.lamda - beta) * div * jnp.ones(z.shape[0])
    return llk, kl, aux


class MIVAE(BetaVAE):
  """Mutual-information VAE (reference ``info_vae.py:100``): decode a prior
  sample (z', c'), re-encode the generated x', and maximize
  ``log q(c'|x')`` — InfoGAN-style code recovery.

  Design note: the reference uses two posterior heads (latents +
  mutual_codes); here one mvndiag head covers ``zdim + code_dim`` units and
  is sliced into (z, c) — an equivalent factorization for the default
  diagonal-Gaussian families that keeps the decoder input static.
  """

  def __init__(self,
               mi_coef: float = 0.2,
               code_dim: int = 10,
               minimize_kl_codes: bool = True,
               latents: Optional[RVconf] = None,
               **kwargs):
    if latents is None:
      latents = RVconf(32, "mvndiag", projection=True, name="latents")
    assert latents.posterior == "mvndiag", \
        "MIVAE requires an mvndiag latent family"
    self.code_dim = int(code_dim)
    self.main_dim = latents.event_size
    latents = latents.copy(event_shape=(self.main_dim + self.code_dim,))
    self.mi_coef = float(mi_coef)
    self.minimize_kl_codes = bool(minimize_kl_codes)
    super().__init__(latents=latents, **kwargs)
    self.codes_prior = MultivariateNormalDiag(jnp.zeros(self.code_dim),
                                              jnp.ones(self.code_dim))
    self.main_prior = MultivariateNormalDiag(jnp.zeros(self.main_dim),
                                             jnp.ones(self.main_dim))

  def _slice(self, qz):
    qm = MultivariateNormalDiag(qz.loc[..., :self.main_dim],
                                qz.scale_diag[..., :self.main_dim])
    qc = MultivariateNormalDiag(qz.loc[..., self.main_dim:],
                                qz.scale_diag[..., self.main_dim:])
    return qm, qc

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qz = self._apply(params, "encode", x, rng=k1, training=training,
                     mutables=mutables)
    qm, qc = self._slice(qz)
    zm = qm.sample(k2)
    c = qc.sample(k3)
    zc = jnp.concatenate([zm, c], axis=-1)
    px = self._apply(params, "decode", zc, rng=k1, training=training,
                     mutables=mutables)
    llk = {"llk_image": px.log_prob(x)}
    beta = self._schedule(self.beta, step)
    kl = {"kl_latents": beta * kl_divergence(
        qm, self.main_prior, analytic=self.analytic, q_sample=zm,
        reverse=self.reverse, free_bits=self.free_bits)}
    if self.minimize_kl_codes:
      kl["kl_codes"] = kl_divergence(qc, self.codes_prior,
                                     analytic=self.analytic, q_sample=c,
                                     reverse=self.reverse)
    # MI lower bound: recover codes from generated samples
    n = zm.shape[0]
    z_prime = self.main_prior.sample(k2, (n,))
    c_prime = self.codes_prior.sample(k3, (n,))
    px_prime = self._apply(params, "decode",
                           jnp.concatenate([z_prime, c_prime], -1),
                           rng=k4, training=training, mutables=mutables)
    x_prime = px_prime.mean()
    qz_prime = self._apply(params, "encode", x_prime, rng=k4,
                           training=training, mutables=mutables)
    _, qc_prime = self._slice(qz_prime)
    llk["mi_codes"] = self.mi_coef * qc_prime.log_prob(c_prime)
    return llk, kl, dict(qz=qz, px=px, z=jnp.concatenate([zm, c], -1), x=x, y=y)
