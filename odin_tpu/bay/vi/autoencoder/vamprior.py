"""VampPrior VAE — variational mixture of posteriors prior.

Reference: ``odin/bay/vi/autoencoder/vamprior.py`` — `Vamprior` mixture
distribution (:25), `VampriorVAE` (:136) (Tomczak & Welling 2018):
``p(z) = 1/K Σ_k q(z | u_k)`` with learned pseudo-inputs u_k.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE

__all__ = ["VampriorVAE"]


class _PseudoInputs(nn.Module):
  """Learnable pseudo-inputs u_1..u_K initialized near the data mean."""

  n_components: int
  input_shape: Tuple[int, ...]

  @nn.compact
  def __call__(self, training: bool = False):
    u = self.param("pseudo_inputs",
                   nn.initializers.normal(0.01),
                   (self.n_components,) + tuple(self.input_shape))
    return jax.nn.sigmoid(u)  # keep pseudo-inputs in data range [0, 1]


class VampriorVAE(BetaVAE):
  """VAE with a VampPrior: the latent KL is estimated by Monte Carlo against
  the mixture-of-posteriors prior evaluated at learned pseudo-inputs."""

  def __init__(self, n_components: int = 50, **kwargs):
    self.n_components = int(n_components)
    self._pseudo: Optional[_PseudoInputs] = None
    super().__init__(**kwargs)

  def extra_networks(self):
    assert self.input_shape is not None
    self._pseudo = _PseudoInputs(n_components=self.n_components,
                                 input_shape=self.input_shape)
    return {"pseudo_inputs": (self._pseudo, lambda: False)}

  def train_steps(self):
    from odin_tpu.training.core import TrainStep
    return [TrainStep(loss_fn=self._vae_loss,
                      partitions=("vae", "pseudo_inputs"), name="vae")]

  def _log_vamp_prior(self, params, z, rng, training, mutables):
    """log p(z) = logsumexp_k log q(z|u_k) - log K."""
    u = self._apply_module(params, "pseudo_inputs", self._pseudo,
                           training=training)
    q_u = self._apply(params, "encode", u, rng=rng, training=training,
                      mutables=mutables)  # batch (K,)
    # z: (B, zdim) -> (B, 1, zdim) vs component batch (K,)
    lp = q_u.log_prob(z[:, None, :])  # (B, K)
    return jax.scipy.special.logsumexp(lp, axis=-1) - np.log(self.n_components)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz = self._apply(params, "encode", x, rng=k1, training=training,
                     mutables=mutables)
    z = qz.sample(k2)
    px = self._apply(params, "decode", z, rng=k1, training=training,
                     mutables=mutables)
    llk = {"llk_image": px.log_prob(x)}
    log_qz = qz.log_prob(z)
    log_pz = self._log_vamp_prior(params, z.reshape(-1, self.zdim), k3,
                                  training, mutables)
    beta = self._schedule(self.beta, step)
    kl = {"kl_latents": beta * (log_qz - log_pz)}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)
