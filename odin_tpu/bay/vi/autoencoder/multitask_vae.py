"""Multitask semi-supervised VAEs.

Reference: ``odin/bay/vi/autoencoder/multitask_vae.py`` — `MultitaskVAE`
(:21), `SkiptaskVAE` (:226), `MultiheadVAE` (:243): an auxiliary label head
decodes y from the decoder hidden state (Multitask) or directly from the
latents (Skiptask); supervised log-likelihood is alpha-weighted, with the
NaN-guard for empty labelled batches (:192-197) realized as a mask-weighted
mean (static shapes, no boolean_mask).

Batch convention: ``(x,)`` unlabelled; ``(x, y)`` fully labelled;
``(x, y, mask)`` semi-supervised with mask=1 for labelled rows.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import AnnealingVAE
from odin_tpu.training.core import TrainStep

__all__ = ["MultitaskVAE", "SkiptaskVAE", "MultiheadVAE"]


def _unpack_ssl(batch):
  if not isinstance(batch, (tuple, list)):
    return batch, None, None
  if len(batch) == 1:
    return batch[0], None, None
  if len(batch) == 2:
    return batch[0], batch[1], None
  return batch[0], batch[1], batch[2]


def masked_mean_llk(llk: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
  """Mean log-likelihood over labelled rows only; 0 when no labels in batch
  (the reference's NaN-guard, ``multitask_vae.py:192-197``)."""
  if mask is None:
    return llk
  mask = mask.reshape(-1).astype(llk.dtype)
  denom = jnp.maximum(jnp.sum(mask), 1.0)
  return llk * mask * (mask.shape[0] / denom)


class MultitaskVAE(AnnealingVAE):
  """Semi-supervised VAE with a supervised head on the decoder hidden state
  (Trong et al. 2019)."""

  def __init__(self,
               labels: Optional[RVconf] = None,
               alpha: float = 10.0,
               skip_decoder: bool = False,
               **kwargs):
    if labels is None:
      labels = RVconf(10, "onehot", projection=True, name="digits")
    self.alpha = float(alpha)
    self.skip_decoder = bool(skip_decoder)
    self.labels_rv = labels if isinstance(labels, RVconf) else None
    kwargs["labels"] = labels
    super().__init__(**kwargs)

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  def predict_labels(self, x=None, latents=None, params=None, seed: int = 0):
    """q(y|...) — from decoder hidden (or latents when skip_decoder)."""
    params = params or self._params_of()
    rng = jax.random.PRNGKey(seed)
    if latents is None:
      qz = self.encode(x, params=params, seed=seed)
      latents = qz.mean()
    h = latents if self.skip_decoder else self._apply(
        params, "decoder_hidden", latents, rng=rng)
    return self._apply(params, "predict_labels", h, rng=rng)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    llk, kl, aux = super().elbo_components(params, x, rng, step,
                                           training=training,
                                           mutables=mutables)
    if y is not None:
      z = aux["z"]
      h = z if self.skip_decoder else self._apply(
          params, "decoder_hidden", z, rng=rng, training=training,
          mutables=mutables)
      qy = self._apply(params, "predict_labels", h, rng=rng,
                       training=training, mutables=mutables)
      llk_y = self.alpha * qy.log_prob(y)
      llk["llk_labels"] = masked_mean_llk(llk_y, mask)
      aux["qy"] = qy
    return llk, kl, aux


class SkiptaskVAE(MultitaskVAE):
  """Label head connected directly to the latents
  (reference ``multitask_vae.py:226``)."""

  def __init__(self, **kwargs):
    kwargs.pop("skip_decoder", None)
    super().__init__(skip_decoder=True, **kwargs)


class MultiheadVAE(MultitaskVAE):
  """Separate dense head per label set on the latents
  (reference ``multitask_vae.py:243``); with the single-labels API this is
  Skiptask with an extra projection."""

  def __init__(self, **kwargs):
    kwargs.pop("skip_decoder", None)
    super().__init__(skip_decoder=True, **kwargs)
