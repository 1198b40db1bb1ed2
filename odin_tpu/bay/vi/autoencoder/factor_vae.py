"""FactorVAE — adversarial total-correlation minimization.

Reference: ``odin/bay/vi/autoencoder/factor_vae.py`` — `FactorVAE` (:99),
`SemiFactorVAE` (:299); two-step training: minibatch split in half, VAE step
adds ``tc_coef · mean(D(z))`` to the KL, discriminator step classifies real
vs `permute_dims` codes (`_split_inputs` :31-62, `FactorDiscriminatorStep`
:65-95).  Both steps run inside ONE compiled update here, with separate
params partitions and optimizers (disc Adam lr 1e-4/1e-5, beta1 .5 beta2 .9,
reference :173-175).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import AnnealingVAE
from odin_tpu.bay.vi.autoencoder.factor_discriminator import (
    FactorDiscriminator,
    dtc_loss_logits,
    total_correlation_logits,
)
from odin_tpu.bay.vi.utils import permute_dims
from odin_tpu.training.core import TrainStep

__all__ = ["FactorVAE", "SemiFactorVAE"]


def _split_half(tree):
  """Split every array in a batch into two halves along axis 0
  (reference `_split_inputs`, ``factor_vae.py:31-62``)."""
  def _half(x, i):
    n = x.shape[0] // 2
    return x[:n] if i == 0 else x[n:2 * n]
  first = jax.tree_util.tree_map(lambda x: _half(x, 0), tree)
  second = jax.tree_util.tree_map(lambda x: _half(x, 1), tree)
  return first, second


class FactorVAE(AnnealingVAE):
  """Disentangling by Factorising (Kim & Mnih 2018).

  Use double the batch size: each iteration splits the minibatch into the
  VAE half and the discriminator half.  Recommended `tc_coef`: dSprites 35,
  Shapes3D 7, CelebA 6.4 (reference :125-141).
  """

  def __init__(self,
               discriminator_units: Sequence[int] = (1000,) * 5,
               activation: str = "relu",
               batchnorm: bool = False,
               tc_coef: float = 7.0,
               maximize_tc: bool = False,
               discriminator_lr: float = 1e-4,
               n_discriminator_outputs: int = 1,
               ss_strategy: str = "logsumexp",
               **kwargs):
    self.discriminator = FactorDiscriminator(
        units=tuple(int(u) for u in discriminator_units),
        activation=activation,
        batchnorm=batchnorm,
        n_outputs=int(n_discriminator_outputs),
        ss_strategy=ss_strategy)
    self.tc_coef = float(tc_coef)
    self.maximize_tc = bool(maximize_tc)
    self.discriminator_lr = float(discriminator_lr)
    self._is_pretraining = False
    super().__init__(**kwargs)

  # -- pretraining switch (reference :196-206) -------------------------------
  @property
  def is_pretraining(self) -> bool:
    return self._is_pretraining

  def pretrain(self) -> "FactorVAE":
    """Train only the VAE (no TC term, no discriminator step)."""
    self._is_pretraining = True
    return self

  def finetune(self) -> "FactorVAE":
    self._is_pretraining = False
    return self

  # -- wiring -----------------------------------------------------------------
  def extra_networks(self):
    zdim = self.zdim
    return {"discriminator": (self.discriminator,
                              lambda: jnp.zeros((1, zdim), jnp.float32))}

  def optimizer_specs(self):
    return {"discriminator": dict(optimizer="adam",
                                  learning_rate=self.discriminator_lr,
                                  kwargs=dict(b1=0.5, b2=0.9))}

  def _discriminator_logits(self, params, z, rng, training):
    logits = self._apply_module(params, "discriminator", self.discriminator,
                                z, rng=rng, training=training)
    return self.discriminator.tc_logits(logits)

  # -- objectives ---------------------------------------------------------------
  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    llk, kl, aux = super().elbo_components(params, batch, rng, step,
                                           training=training,
                                           mutables=mutables)
    if not (self.is_pretraining and training):
      z = aux["z"].reshape(-1, self.zdim)
      tc_logit = self._discriminator_logits(params, z, rng, training)
      tc = self.tc_coef * total_correlation_logits(tc_logit)
      if self.maximize_tc:
        tc = -tc
      kl["tc"] = tc * jnp.ones(z.shape[0])
    return llk, kl, aux

  def dtc_loss(self, params, batch, rng, step, mutables):
    """Discriminator loss on the second half-batch: real codes vs
    permute_dims codes (reference `FactorDiscriminatorStep`, :65-95)."""
    x, y = self._split_inputs(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz = self._apply(params, "encode", x, rng=k1, training=True,
                     mutables=mutables)
    z = jax.lax.stop_gradient(qz.sample(k2).reshape(-1, self.zdim))
    z_logit = self._discriminator_logits(params, z, k1, True)
    z_perm = permute_dims(z, k3)
    zperm_logit = self._discriminator_logits(params, z_perm, k1, True)
    loss = dtc_loss_logits(z_logit, zperm_logit)
    metrics = {"dtc_loss": loss}
    sup = self._supervised_loss(params, z, y, k1)
    if sup is not None:
      loss = loss + sup
      metrics["supv_loss"] = sup
    return loss, (metrics, mutables)

  def _supervised_loss(self, params, z, y, rng):
    return None  # SemiFactorVAE overrides

  # -- training -----------------------------------------------------------------
  def _vae_half_loss(self, params, batch, rng, step, mutables):
    first, _ = _split_half(batch)
    return self._vae_loss(params, first, rng, step, mutables)

  def _disc_half_loss(self, params, batch, rng, step, mutables):
    _, second = _split_half(batch)
    return self.dtc_loss(params, second, rng, step, mutables)

  def train_steps(self) -> List[TrainStep]:
    steps = [TrainStep(loss_fn=self._vae_half_loss, partitions=("vae",),
                       name="elbo")]
    if not self.is_pretraining:
      steps.append(TrainStep(loss_fn=self._disc_half_loss,
                             partitions=("discriminator",), name="disc"))
    return steps


class SemiFactorVAE(FactorVAE):
  """Semi-supervised FactorVAE (reference ``factor_vae.py:299``): the
  discriminator gains label output units; the labelled half-batch adds a
  supervised log-likelihood to the discriminator step."""

  def __init__(self,
               n_labels: int = 10,
               alpha: float = 10.0,
               ss_strategy: str = "logsumexp",
               **kwargs):
    self.n_labels = int(n_labels)
    self.alpha = float(alpha)
    kwargs.setdefault("n_discriminator_outputs", 1 + self.n_labels)
    super().__init__(ss_strategy=ss_strategy, **kwargs)

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  def _supervised_loss(self, params, z, y, rng):
    if y is None:
      return None
    logits = self._apply_module(params, "discriminator", self.discriminator,
                                z, rng=rng, training=True)
    label_logits = logits[..., 1:1 + self.n_labels]
    y = y.reshape(y.shape[0], -1)[:, :self.n_labels]
    log_p = jax.nn.log_softmax(label_logits, axis=-1)
    llk = jnp.sum(y * log_p, axis=-1)
    return -self.alpha * jnp.mean(llk)
