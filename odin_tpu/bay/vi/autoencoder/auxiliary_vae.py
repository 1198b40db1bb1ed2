"""Auxiliary deep generative model (ADGM).

Reference: ``odin/bay/vi/autoencoder/auxiliary_vae.py:21`` (`auxiliaryVAE`,
Maaløe et al. 2016): inference q(a|x) q(y|x,a) q(z|a,x,y); generative
p(a|y,z) p(x|y,z).  The auxiliary variable `a` enriches the x->y mapping.

TPU realization: a dedicated flax core with auxiliary encoder/decoder MLPs;
the label path uses soft labels from the classifier (M2-style), with the
alpha-weighted supervised log-likelihood on labelled rows.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE
from odin_tpu.bay.vi.autoencoder.multitask_vae import (
    _unpack_ssl,
    masked_mean_llk,
)
from odin_tpu.networks.base import Dense, Flatten, SequentialNetwork
from odin_tpu.networks.conditional_embedding import get_embedding

__all__ = ["auxiliaryVAE", "AuxiliaryVAE"]


class _ADGMCore(nn.Module):
  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  labels: DistributionDense
  qa_head: DistributionDense
  pa_head: DistributionDense
  embed_dim: int = 128
  n_classes: int = 10
  embedding_method: str = "projection"

  def setup(self):
    e = self.embed_dim
    # label embedder family (reference ``auxiliary_vae.py:78-99`` routes
    # embedding_method into the conditional trunk)
    emb_cls = get_embedding(self.embedding_method)
    self.enc_a = SequentialNetwork((Flatten(), Dense(512, "relu"),
                                    Dense(512, "relu")), name="enc_a")
    self.x_to_qy = nn.Dense(e)
    self.a_to_qy = nn.Dense(e)
    self.qy_net = Dense(e, "relu")
    self.a_to_qz = nn.Dense(e)
    self.y_to_qz = emb_cls(n_classes=self.n_classes, event_shape=(e,))
    self.axy_to_qz = Dense(e, "relu")
    self.z_to_px = nn.Dense(e)
    self.y_to_px = emb_cls(n_classes=self.n_classes, event_shape=(e,))
    self.zy_to_px = Dense(e, "relu")
    self.dec_a = Dense(512, "relu")

  def encode_a(self, x, training: bool = False):
    """q(a|x)."""
    h = self.enc_a(x, training=training)
    return self.qa_head(h, training=training)

  def classify(self, x, a, training: bool = False):
    """q(y|x, a)."""
    hx = self.x_to_qy(x.reshape(x.shape[0], -1))
    ha = self.a_to_qy(a)
    h = jax.nn.relu(jnp.concatenate([hx, ha], -1))
    h = self.qy_net(h, training=training)
    return self.labels(h, training=training)

  def encode(self, x, a=None, y=None, training: bool = False):
    """q(z | a, x, y)."""
    h = self.encoder(x, training=training)
    h = h.reshape(h.shape[0], -1)
    parts = [h]
    if a is not None:
      parts.append(self.a_to_qz(a))
    if y is not None:
      parts.append(self.y_to_qz(y))
    h = jnp.concatenate(parts, -1)
    h = self.axy_to_qz(h, training=training)
    return self.latents(h, training=training)

  def decode(self, z, y=None, training: bool = False):
    """p(x | z, y) and p(a | z, y)."""
    parts = [self.z_to_px(z)]
    if y is not None:
      parts.append(self.y_to_px(y))
    h = jnp.concatenate(parts, -1)
    h = self.zy_to_px(h, training=training)
    hx = self.decoder(h, training=training)
    px = self.observation(hx, training=training)
    ha = self.dec_a(h, training=training)
    pa = self.pa_head(ha, training=training)
    return px, pa

  def __call__(self, x, training: bool = False):
    qa = self.encode_a(x, training=training)
    a = qa.mean()
    qy = self.classify(x, a, training=training)
    y = qy.mean()
    qz = self.encode(x, a, y, training=training)
    z = qz.mean()
    px, pa = self.decode(z, y, training=training)
    return px, qz


class auxiliaryVAE(BetaVAE):
  """ADGM (reference ``auxiliary_vae.py:21``)."""

  def __init__(self,
               labels: Optional[RVconf] = None,
               auxiliary: Optional[RVconf] = None,
               alpha: float = 1.0,
               embed_dim: int = 128,
               embedding_method: str = "projection",
               **kwargs):
    if labels is None:
      labels = RVconf(10, "onehot", projection=True, name="digits")
    if auxiliary is None:
      auxiliary = RVconf(64, "mvndiag", projection=True, name="auxiliary")
    self.alpha = float(alpha)
    self.embed_dim = int(embed_dim)
    self.embedding_method = str(embedding_method)
    self.auxiliary_conf = auxiliary
    kwargs["labels"] = labels
    super().__init__(**kwargs)
    self.a_prior = auxiliary.create_prior()

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  def _build_core(self) -> nn.Module:
    return _ADGMCore(encoder=self.encoder_net, decoder=self.decoder_net,
                     latents=self.latents_head,
                     observation=self.observation_head,
                     labels=self.labels_head,
                     qa_head=self.auxiliary_conf.create_posterior(name="qa_x"),
                     pa_head=self.auxiliary_conf.create_posterior(name="pa_zy"),
                     embed_dim=self.embed_dim,
                     n_classes=self.labels_conf.event_size,
                     embedding_method=self.embedding_method)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    qa = self._apply(params, "encode_a", x, rng=k1, training=training,
                     mutables=mutables)
    a = qa.sample(k2)
    qy = self._apply(params, "classify", x, a, rng=k1, training=training,
                     mutables=mutables)
    y_soft = qy.mean()
    y_use = y_soft if y is None else (
        y if mask is None else
        mask.reshape(-1, 1) * y + (1 - mask.reshape(-1, 1)) * y_soft)
    qz = self._apply(params, "encode", x, a, y_use, rng=k1,
                     training=training, mutables=mutables)
    z = qz.sample(k3)
    px, pa = self._apply(params, "decode", z, y_use, rng=k1,
                         training=training, mutables=mutables)
    llk = {
        "llk_image": px.log_prob(x),
        # reconstruction of the auxiliary variable: E_q[log p(a|z,y)]
        "llk_auxiliary": pa.log_prob(a),
        "H_qy": -jnp.sum(y_soft * jnp.log(y_soft + 1e-6), -1),
    }
    beta = self._schedule(self.beta, step)
    kl = {
        "kl_latents": beta * kl_divergence(
            qz, self.latents_prior, analytic=self.analytic, q_sample=z,
            reverse=self.reverse, free_bits=self.free_bits),
        # q(a|x) entropy term: KL(q(a|x) || p(a)) rewritten with p(a|z,y)
        # in the llk above (standard ADGM decomposition)
        "kl_auxiliary": qa.log_prob(a),
    }
    if y is not None:
      llk["llk_digits"] = masked_mean_llk(self.alpha * qy.log_prob(y), mask)
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, qy=qy, qa=qa)


AuxiliaryVAE = auxiliaryVAE
