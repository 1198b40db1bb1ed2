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

from typing import Any, Optional, Union

import flax.linen as nn
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


class _DualLatentCore(nn.Module):
  """Trunk for semafod/semafoh (reference ``semafo_vae.py:252-408``): two
  latent heads — q(z|h) plus a label-aligned q(z_y|·) — decoded jointly.
  `hierarchical=True` (semafoh) conditions z_y on [h, z~q(z|h)] instead of
  h alone."""

  encoder: Any
  decoder: Any
  latents: Any
  latents_y: Any
  observation: Any
  labels: Any
  hierarchical: bool = False

  def encode(self, x, training: bool = False):
    h = self.encoder(x, training=training)
    qz1 = self.latents(h, training=training)
    if self.hierarchical:
      z1 = qz1.sample(self.make_rng("sample"))
      qz2 = self.latents_y(jnp.concatenate([h, z1], -1), training=training)
    else:
      qz2 = self.latents_y(h, training=training)
    return qz1, qz2

  def decode(self, z, training: bool = False):
    """z is the concatenated [z1, z_y]."""
    h = self.decoder(z, training=training)
    return self.observation(h, training=training)

  def predict_labels(self, z2, training: bool = False):
    return self.labels(z2, training=training)

  def __call__(self, x, training: bool = False):
    qz1, qz2 = self.encode(x, training=training)
    px = self.decode(jnp.concatenate([qz1.mean(), qz2.mean()], -1),
                     training=training)
    self.predict_labels(qz2.mean(), training=training)
    return px, qz1


class semafod(SemafoVAE):
  """Semafo with DOUBLE latents (reference ``semafo_vae.py:252``): a second,
  label-aligned latent z_y (zdim = n_labels) predicted in parallel with z;
  p(y|z_y), decode from [z, z_y], extra beta-weighted KL on z_y."""

  hierarchical_zy = False

  def __init__(self, **kwargs):
    super().__init__(**kwargs)
    # priors are built EAGERLY post-super (base __init__ resets _priors
    # after _build_core runs)
    self._priors["latents_y"] = self._latents_y_conf.create_prior()

  def _build_core(self):
    n_labels = self.labels_conf.event_size if self.labels_conf is not None \
        else 10
    self._latents_y_conf = RVconf(int(n_labels), "mvndiag", projection=True,
                                  name="latents_y")
    return _DualLatentCore(encoder=self.encoder_net,
                           decoder=self.decoder_net,
                           latents=self.latents_head,
                           latents_y=self._latents_y_conf.create_posterior(),
                           observation=self.observation_head,
                           labels=self.labels_head,
                           hierarchical=self.hierarchical_zy)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    from odin_tpu.bay.helpers import kl_divergence
    x, y, mask = _unpack_ssl(batch)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qz1, qz2 = self._apply(params, "encode", x, rng=k1, training=training,
                           mutables=mutables)
    z1 = qz1.sample(k2)
    z2 = qz2.sample(k3)
    px = self._apply(params, "decode", jnp.concatenate([z1, z2], -1),
                     rng=k1, training=training, mutables=mutables)
    beta = self._schedule(self.beta, step)
    obs_name = getattr(self.observation_head, "name", None) or "observation"
    llk = {f"llk_{obs_name}": px.log_prob(x)}
    kl = {
        "kl_latents": beta * kl_divergence(
            qz1, self.latents_prior, analytic=self.analytic, q_sample=z1,
            reverse=self.reverse, free_bits=self.free_bits),
        "kl_latents_y": beta * kl_divergence(
            qz2, self._priors["latents_y"], analytic=self.analytic,
            q_sample=z2, reverse=self.reverse, free_bits=self.free_bits),
    }
    py_z = self._apply(params, "predict_labels", z2, rng=k1,
                       training=training, mutables=mutables)
    name = self.labels_conf.name if self.labels_conf is not None else "labels"
    if y is not None:
      llk[f"llk_{name}"] = masked_mean_llk(self.alpha * py_z.log_prob(y),
                                           mask)
    # MI on prior samples: z' ~ p(z)p(z_y), decode, re-encode, agreement of
    # q(y|z_y~) with p(y|z_y) (reference which_latents_sampling=[1])
    kk1, kk2, kk3 = jax.random.split(k4, 3)
    B = z1.shape[0]
    z1p = self.latents_prior.sample(kk1, (B,))
    z2p = self._priors["latents_y"].sample(kk2, (B,))
    xp = self._apply(params, "decode", jnp.concatenate([z1p, z2p], -1),
                     rng=kk1, training=training, mutables=mutables).mean()
    _, qz2p = self._apply(params, "encode", xp, rng=kk2, training=training,
                          mutables=mutables)
    qy_z = self._apply(params, "predict_labels", qz2p.sample(kk3), rng=kk2,
                       training=training, mutables=mutables)
    y_s = jax.lax.stop_gradient(qy_z.sample(kk3))
    mi_y = jnp.mean(qy_z.log_prob(y_s) - py_z.log_prob(y_s))
    if training:
      mi_y = jnp.where(step >= self.steps_without_mi, mi_y,
                       jax.lax.stop_gradient(mi_y))
    else:
      mi_y = jax.lax.stop_gradient(mi_y)
    llk[f"mi_{name}"] = self.mi_coef(step) * mi_y * jnp.ones(B)
    return llk, kl, dict(qz=qz1, qz_y=qz2, px=px, z=z1, x=x, y=y)

  def encode(self, x, params=None, training: bool = False, seed: int = 0):
    params = params or self._params_of()
    qz1, _ = self._apply(params, "encode", jnp.asarray(x),
                         rng=jax.random.PRNGKey(seed), training=training,
                         mutables=self.state.mutables if self.state else None)
    return qz1

  def reconstruct(self, x, params=None, seed: int = 0):
    params = params or self._params_of()
    if not hasattr(self, "_reconstruct_jit"):
      def _fn(p, x, rng):
        qz1, qz2 = self._apply(p, "encode", x, rng=rng, training=False)
        px = self._apply(p, "decode",
                         jnp.concatenate([qz1.mean(), qz2.mean()], -1),
                         rng=rng, training=False)
        return qz1, px
      self._reconstruct_jit = jax.jit(_fn)
    return self._reconstruct_jit(params, jnp.asarray(x),
                                 jax.random.PRNGKey(seed))


class semafoh(semafod):
  """Semafo with double HIERARCHICAL latents (reference
  ``semafo_vae.py:390``): z_y conditioned on [h, z] instead of h."""

  hierarchical_zy = True


class _CondDecodeCore(nn.Module):
  """Trunk for the semafos family (reference ``semafo_vae.py:415-521``):
  the decoder consumes [z, y], with y the true labels (supervised) or
  stop-gradient predicted labels."""

  encoder: Any
  decoder: Any
  latents: Any
  observation: Any
  labels: Any

  def encode(self, x, training: bool = False):
    h = self.encoder(x, training=training)
    return self.latents(h, training=training)

  def decode_zy(self, z, y, training: bool = False):
    h = self.decoder(jnp.concatenate([z, y], -1), training=training)
    return self.observation(h, training=training)

  def decode(self, z, training: bool = False):
    """Generation: condition on the predicted labels."""
    py = self.predict_labels(z, training=training)
    return self.decode_zy(z, py.mean(), training=training)

  def predict_labels(self, z, training: bool = False):
    return self.labels(z, training=training)

  def __call__(self, x, training: bool = False):
    qz = self.encode(x, training=training)
    z = qz.mean()
    py = self.predict_labels(z, training=training)
    px = self.decode_zy(z, py.mean(), training=training)
    return px, qz


class semafos(SemafoVAE):
  """Semafo with SEPARATED training steps and conditional decoding
  (reference ``semafo_vae.py:415``): p(x|z,y) where y is the true label for
  labelled rows and stop-grad p(y|z) otherwise; the supervised
  classification llk trains in its own TrainStep."""

  condition_on_labels = True

  def _build_core(self):
    return _CondDecodeCore(encoder=self.encoder_net,
                           decoder=self.decoder_net,
                           latents=self.latents_head,
                           observation=self.observation_head,
                           labels=self.labels_head)

  def _decode_cond(self, params, z, py_z, y, mask, rng, training, mutables):
    y_pred = jax.lax.stop_gradient(py_z.mean())
    if self.condition_on_labels and y is not None:
      m = (mask.reshape(-1, 1) if mask is not None
           else jnp.ones((z.shape[0], 1), z.dtype))
      y_cond = m * y + (1 - m) * y_pred
    else:
      y_cond = y_pred
    return self._apply(params, "decode_zy", z, y_cond, rng=rng,
                       training=training, mutables=mutables)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    from odin_tpu.bay.helpers import kl_divergence
    x, y, mask = _unpack_ssl(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz = self._apply(params, "encode", x, rng=k1, training=training,
                     mutables=mutables)
    z = qz.sample(k2)
    py_z = self._apply(params, "predict_labels", z, rng=k1,
                       training=training, mutables=mutables)
    px = self._decode_cond(params, z, py_z, y, mask, k1, training, mutables)
    beta = self._schedule(self.beta, step)
    obs_name = getattr(self.observation_head, "name", None) or "observation"
    llk = {f"llk_{obs_name}": px.log_prob(x)}
    kl = {"kl_latents": beta * kl_divergence(
        qz, self.latents_prior, analytic=self.analytic, q_sample=z,
        reverse=self.reverse, free_bits=self.free_bits)}
    mi_y, _ = self._mi_loss(params, qz, py_z, k3, step, training, mutables)
    name = self.labels_conf.name if self.labels_conf is not None else "labels"
    llk[f"mi_{name}"] = mi_y * jnp.ones(z.shape[0])
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, qy=py_z, mask=mask)

  def _supervised_loss(self, params, batch, rng, step, mutables):
    """Separate step: alpha-weighted classification llk on labelled rows."""
    x, y, mask = _unpack_ssl(batch)
    name = self.labels_conf.name if self.labels_conf is not None else "labels"
    if y is None:
      return jnp.zeros(()), ({f"llk_{name}": jnp.zeros(())}, mutables)
    k1, k2 = jax.random.split(rng)
    qz = self._apply(params, "encode", x, rng=k1, training=True,
                     mutables=mutables)
    py_z = self._apply(params, "predict_labels", qz.sample(k2), rng=k1,
                       training=True, mutables=mutables)
    llk_y = masked_mean_llk(self.alpha * py_z.log_prob(y), mask)
    loss = -jnp.mean(llk_y)
    return loss, ({f"llk_{name}": jnp.mean(llk_y)}, mutables)

  def train_steps(self):
    from odin_tpu.training.core import TrainStep
    return [
        TrainStep(loss_fn=self._vae_loss, partitions=("vae",),
                  optimizer="vae", name="elbo"),
        TrainStep(loss_fn=self._supervised_loss, partitions=("vae",),
                  optimizer="vae", name="supervised"),
    ]

  def _mi_loss(self, params, qz, py_z, rng, step, training, mutables):
    """Prior-sample MI with the conditional decoder."""
    k1, k2, k3 = jax.random.split(rng, 3)
    B = qz.batch_shape[0]
    z_prime = self.latents_prior.sample(k1, (B,))
    py_prime = self._apply(params, "predict_labels", z_prime, rng=k2,
                           training=training, mutables=mutables)
    px = self._apply(params, "decode_zy", z_prime,
                     jax.lax.stop_gradient(py_prime.mean()), rng=k2,
                     training=training, mutables=mutables)
    qz_prime = self._apply(params, "encode", px.mean(), rng=k2,
                           training=training, mutables=mutables)
    z_tilde = qz_prime.sample(k3)
    qy_z = self._apply(params, "predict_labels", z_tilde, rng=k2,
                       training=training, mutables=mutables)
    y_s = jax.lax.stop_gradient(qy_z.sample(k3))
    dkl = qy_z.log_prob(y_s) - py_prime.log_prob(y_s)
    mi_y = jnp.mean(dkl)
    if training:
      mi_y = jnp.where(step >= self.steps_without_mi, mi_y,
                       jax.lax.stop_gradient(mi_y))
    else:
      mi_y = jax.lax.stop_gradient(mi_y)
    return self.mi_coef(step) * mi_y, jnp.zeros(())

  def reconstruct(self, x, params=None, seed: int = 0):
    params = params or self._params_of()
    if not hasattr(self, "_reconstruct_jit"):
      def _fn(p, x, rng):
        qz = self._apply(p, "encode", x, rng=rng, training=False)
        z = qz.mean()
        py = self._apply(p, "predict_labels", z, rng=rng, training=False)
        px = self._apply(p, "decode_zy", z, py.mean(), rng=rng,
                         training=False)
        return qz, px
      self._reconstruct_jit = jax.jit(_fn)
    return self._reconstruct_jit(params, jnp.asarray(x),
                                 jax.random.PRNGKey(seed))


class _MultitaskDecodeCore(_CondDecodeCore):
  """decode_zy drops y: plain p(x|z) with a side label task (semafosm)."""

  def decode_zy(self, z, y, training: bool = False):
    h = self.decoder(z, training=training)
    return self.observation(h, training=training)

  def decode(self, z, training: bool = False):
    h = self.decoder(z, training=training)
    return self.observation(h, training=training)


class semafosm(semafos):
  """Separated steps + MULTI-TASK decoding (reference
  ``semafo_vae.py:485``): the decoder consumes z only; y is predicted as a
  side task."""

  def _build_core(self):
    return _MultitaskDecodeCore(encoder=self.encoder_net,
                                decoder=self.decoder_net,
                                latents=self.latents_head,
                                observation=self.observation_head,
                                labels=self.labels_head)


class semafosc(semafos):
  """Separated steps + SIMPLE conditioning (reference ``semafo_vae.py:502``):
  the decoder always consumes stop-grad p(y|z) — never the true labels."""

  condition_on_labels = False


class semafop(SemafoVAE):
  """Semafo minimizing D(q(y|z_u) || p(y|z_l)) directly between the
  unlabelled and labelled halves of the batch (reference
  ``semafo_vae.py:525``)."""

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2 = jax.random.split(rng)
    llk, kl, aux = AnnealingVAE.elbo_components(self, params, x, k1, step,
                                                training=training,
                                                mutables=mutables)
    z = aux["z"]
    py_z = self.predict_factors(params, z, k1, training, mutables)
    aux["qy"] = py_z
    name = self.labels_conf.name if self.labels_conf is not None else "labels"
    if y is not None:
      llk[f"llk_{name}"] = masked_mean_llk(self.alpha * py_z.log_prob(y),
                                           mask)
      # D(q(y|z_u)||p(y|z_l)): mask-weighted difference of label llks on
      # predicted labels (static-shape replacement for boolean_mask)
      y_s = jax.lax.stop_gradient(py_z.sample(k2))
      lp = py_z.log_prob(y_s)
      m = (mask.reshape(-1) if mask is not None
           else jnp.ones(z.shape[0], lp.dtype))
      n_u = jnp.maximum(jnp.sum(1 - m), 1.0)
      n_l = jnp.maximum(jnp.sum(m), 1.0)
      kl[f"kl_{name}"] = self.mi_coef(step) * (
          jnp.sum(lp * (1 - m)) / n_u - jnp.sum(lp * m) / n_l) \
          * jnp.ones(z.shape[0]) / z.shape[0]
    return llk, kl, aux


class semafot(SemafoVAE):
  """Semafo with extended MI warmup (reference ``semafo_vae.py:576``)."""

  def __init__(self, steps_without_mi: int = 5000, **kwargs):
    kwargs.pop("steps_without_mi", None)
    super().__init__(steps_without_mi=steps_without_mi, **kwargs)
