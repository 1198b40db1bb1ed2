"""Two-Stage VAE.

Reference: ``odin/bay/vi/autoencoder/two_stage_vae.py:17`` (Dai & Wipf 2019
"Diagnosing and Enhancing VAE Models"): stage 1 learns q(z|x)/p(x|z); stage 2
learns a second VAE u ~ q(u|z) over the aggregate posterior to fix the
prior-hole mismatch (`elbo_components2`, reference :181).

Both stages train inside one compiled step here: the stage-2 ELBO consumes
stop-gradient latents from stage 1, so the two parameter partitions stay
independent exactly as sequential training in the reference.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import VAECore
from odin_tpu.networks.base import Dense, SequentialNetwork
from odin_tpu.training.core import TrainStep

__all__ = ["TwoStageVAE"]


class TwoStageVAE(BetaVAE):

  def __init__(self,
               udim: Optional[int] = None,
               stage2_units: int = 128,
               stage2_layers: int = 2,
               **kwargs):
    super().__init__(**kwargs)
    udim = int(udim or self.zdim)
    self.udim = udim
    enc2 = SequentialNetwork(
        tuple(Dense(int(stage2_units), "relu") for _ in range(stage2_layers)),
        name="encoder2")
    dec2 = SequentialNetwork(
        tuple(Dense(int(stage2_units), "relu") for _ in range(stage2_layers)),
        name="decoder2")
    self.latents2_conf = RVconf(udim, "mvndiag", projection=True, name="u")
    self.stage2 = VAECore(
        encoder=enc2, decoder=dec2,
        latents=self.latents2_conf.create_posterior(),
        observation=RVconf((self.zdim,), "gaussian", projection=True,
                           name="z").create_posterior())
    self.u_prior = self.latents2_conf.create_prior()

  def extra_networks(self):
    zdim = self.zdim
    return {"stage2": (self.stage2, lambda: jnp.zeros((1, zdim), jnp.float32))}

  def elbo_components2(self, params, z, rng, step, training=False):
    """Stage-2 ELBO over latents z (reference ``two_stage_vae.py:181``)."""
    k1, k2 = jax.random.split(rng)
    variables = {"params": params["stage2"]}
    qu = self.stage2.apply(variables, z, training=training,
                           method=self.stage2.encode,
                           rngs={"dropout": k1})
    u = qu.sample(k2)
    pz = self.stage2.apply(variables, u, training=training,
                           method=self.stage2.decode,
                           rngs={"dropout": k1})
    llk = {"llk_z": pz.log_prob(z)}
    kl = {"kl_u": kl_divergence(qu, self.u_prior, analytic=self.analytic,
                                q_sample=u, reverse=self.reverse)}
    return llk, kl, dict(qu=qu, pz=pz, u=u)

  def _stage2_loss(self, params, batch, rng, step, mutables):
    x, _ = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    qz = self._apply(params, "encode", x, rng=k1, training=True,
                     mutables=mutables)
    z = jax.lax.stop_gradient(qz.sample(k2).reshape(-1, self.zdim))
    llk, kl, _ = self.elbo_components2(params, z, rng, step, training=True)
    elbo = self.elbo(llk, kl)
    loss = -jnp.mean(elbo)
    metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
    return loss, (metrics, mutables)

  def train_steps(self):
    return [
        TrainStep(loss_fn=self._vae_loss, partitions=("vae",), name="stage1"),
        TrainStep(loss_fn=self._stage2_loss, partitions=("stage2",),
                  name="stage2"),
    ]

  def sample_prior(self, n: int = 1, seed: int = 0):
    """Ancestral sampling through stage 2: u ~ p(u), z ~ p(z|u)
    — the corrected prior of Dai & Wipf."""
    key = jax.random.PRNGKey(seed)
    u = self.u_prior.sample(key, (n,))
    variables = {"params": self._params_of()["stage2"]}
    pz = self.stage2.apply(variables, u, method=self.stage2.decode)
    return pz.sample(key)
