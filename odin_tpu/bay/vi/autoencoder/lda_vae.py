"""Amortized LDA — Dirichlet-latent topic models as VAEs.

Reference: ``odin/bay/vi/autoencoder/lda_vae.py`` — `LatentDirichletDecoder`
(:42), `amortizedLDA` (:382), `auxiliaryLDA` (:473), `nonlinearLDA` (:497),
`ALDA` (:544); ProdLDA/amortized-LDA (Srivastava & Sutton 2017): encoder ->
Dirichlet posterior over topic proportions theta; decoder is the topic-word
matrix; likelihood is Multinomial over word counts; perplexity tracked.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions import Dirichlet, Multinomial
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)
from odin_tpu.networks.base import Dense, SequentialNetwork

__all__ = ["LatentDirichletDecoder", "amortizedLDA", "auxiliaryLDA",
           "nonlinearLDA", "ALDA"]


class LatentDirichletDecoder(nn.Module):
  """theta -> word distribution via the topic-word matrix
  (reference ``lda_vae.py:42``)."""

  n_words: int
  n_topics: int = 10
  nonlinear: bool = False

  @nn.compact
  def __call__(self, theta, training: bool = False):
    if self.nonlinear:
      theta = Dense(64, "relu", name="nonlinear")(theta, training=training)
      topics = nn.Dense(self.n_words, name="topics_words")(theta)
      return jax.nn.log_softmax(topics, axis=-1)
    topics = self.param("topics_words", nn.initializers.normal(1.0),
                        (self.n_topics, self.n_words))
    word_probs = theta @ jax.nn.softmax(topics, axis=-1)
    return jnp.log(word_probs + 1e-10)


class _LDACore(nn.Module):
  encoder: Any
  latents: DistributionDense
  topic_decoder: LatentDirichletDecoder

  def encode(self, x, training: bool = False):
    h = self.encoder(jnp.log1p(x), training=training)
    return self.latents(h, training=training)

  def decode(self, theta, training: bool = False):
    return self.topic_decoder(theta, training=training)

  def __call__(self, x, training: bool = False):
    q_theta = self.encode(x, training=training)
    log_word = self.decode(q_theta.mean(), training=training)
    return log_word, q_theta


class amortizedLDA(VariationalAutoencoder):
  """Amortized LDA (reference ``lda_vae.py:382``)."""

  def __init__(self,
               n_words: int,
               n_topics: int = 10,
               prior_concentration: float = 0.7,
               encoder=None,
               nonlinear: bool = False,
               **kwargs):
    self.n_words = int(n_words)
    self.n_topics = int(n_topics)
    self.nonlinear = bool(nonlinear)
    latents = RVconf(self.n_topics, "dirichlet", projection=True,
                     name="topics")
    if encoder is None:
      encoder = SequentialNetwork(
          (Dense(128, "relu"), Dense(128, "relu")), name="encoder")
    kwargs.pop("latents", None)
    kwargs.pop("observation", None)
    kwargs.pop("decoder", None)
    kwargs.setdefault("input_shape", (self.n_words,))
    super().__init__(encoder=encoder,
                     latents=latents,
                     observation=RVconf((self.n_words,), "deterministic",
                                        projection=False, name="docs"),
                     **kwargs)
    self.prior_concentration = float(prior_concentration)
    self._priors["latents"] = Dirichlet(
        jnp.full((self.n_topics,), self.prior_concentration))

  def _build_core(self) -> nn.Module:
    return _LDACore(
        encoder=self.encoder_net,
        latents=self.latents_head,
        topic_decoder=LatentDirichletDecoder(
            n_words=self.n_words,
            n_topics=self.n_topics,
            nonlinear=self.nonlinear))

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    q_theta = self._apply(params, "encode", x, rng=k1, training=training,
                          mutables=mutables)
    theta = q_theta.sample(k2)
    log_word = self._apply(params, "decode", theta, rng=k1,
                           training=training, mutables=mutables)
    # multinomial log-likelihood of the word counts (dropping the constant
    # multinomial coefficient exactly like the reference)
    llk_x = jnp.sum(x * log_word, axis=-1)
    llk = {"llk_docs": llk_x}
    kl = {"kl_topics": kl_divergence(q_theta, self.latents_prior,
                                     analytic=self.analytic, q_sample=theta,
                                     reverse=self.reverse)}
    return llk, kl, dict(qz=q_theta, px=None, z=theta, x=x, y=y,
                         log_word=log_word)

  def _vae_loss(self, params, batch, rng, step, mutables):
    llk, kl, aux = self.elbo_components(params, batch, rng, step,
                                        training=True, mutables=mutables)
    elbo = self.elbo(llk, kl)
    loss = -jnp.mean(elbo)
    metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
    x = aux["x"]
    n_words = jnp.sum(x, axis=-1)
    metrics["perplexity"] = jnp.exp(-jnp.mean(elbo) /
                                    jnp.maximum(jnp.mean(n_words), 1.0))
    return loss, (metrics, mutables)

  def perplexity(self, x, seed: int = 0) -> float:
    """Corpus perplexity exp(-elbo / n_words) (reference ``lda_vae.py`` and
    ``_base.py:233``)."""
    llk, kl, aux = self.elbo_components(self._params_of(), jnp.asarray(x),
                                        jax.random.PRNGKey(seed), 0)
    elbo = self.elbo(llk, kl)
    n = jnp.sum(jnp.asarray(x))
    return float(jnp.exp(-jnp.sum(elbo) / jnp.maximum(n, 1.0)))

  def transform(self, x, seed: int = 0) -> np.ndarray:
    """Posterior document-topic mixtures ``[n_docs, n_topics]`` (rows sum
    to 1) — sklearn ``LatentDirichletAllocation.transform`` semantics, which
    the reference's LDA interface mirrors."""
    q_theta = self.encode(jnp.asarray(x), seed=seed)
    theta = q_theta.mean()
    theta = theta / jnp.maximum(jnp.sum(theta, -1, keepdims=True), 1e-12)
    return np.asarray(theta)

  def get_topics(self, top_k: int = 10):
    """Topic-word weights (for inspection).

    Works for every variant: the linear decoder's `topics_words` parameter
    is read directly; the nonlinear decoder (where `topics_words` is a
    Dense submodule) is probed by decoding the K one-hot topic mixtures."""
    p = self._params_of()["vae"]["topic_decoder"].get("topics_words")
    if p is not None and not isinstance(p, dict):
      probs = jax.nn.softmax(p, axis=-1)
    else:
      eye = jnp.eye(self.n_topics, dtype=jnp.float32)
      log_word = self._apply(self._params_of(), "decode", eye)
      probs = jnp.exp(log_word)
      probs = probs / jnp.maximum(probs.sum(-1, keepdims=True), 1e-12)
    idx = jnp.argsort(-probs, axis=-1)[:, :top_k]
    return np.asarray(idx), np.asarray(probs)


class nonlinearLDA(amortizedLDA):
  """Nonlinear topic decoder (reference ``lda_vae.py:497``)."""

  def __init__(self, n_words: int, **kwargs):
    kwargs.pop("nonlinear", None)
    super().__init__(n_words=n_words, nonlinear=True, **kwargs)


class auxiliaryLDA(amortizedLDA):
  """LDA with auxiliary supervised head (reference ``lda_vae.py:473``):
  labelled batches add an alpha-weighted classifier on theta."""

  def __init__(self, n_words: int, n_labels: int = 10, alpha: float = 10.0,
               **kwargs):
    self.n_labels = int(n_labels)
    self.alpha = float(alpha)
    super().__init__(n_words=n_words, **kwargs)

  def extra_networks(self):
    head = RVconf(self.n_labels, "onehot", projection=True,
                  name="topics_labels").create_posterior()
    self._labels_head2 = head
    return {"labels": (head,
                       lambda: jnp.zeros((1, self.n_topics), jnp.float32))}

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True  # consumes (x, y[, mask]) batches; y=None degrades cleanly

  def train_steps(self):
    from odin_tpu.training.core import TrainStep
    return [TrainStep(loss_fn=self._vae_loss, partitions=("vae", "labels"),
                      name="vae")]

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    from odin_tpu.bay.vi.autoencoder.multitask_vae import (
        _unpack_ssl, masked_mean_llk)
    x, y, mask = _unpack_ssl(batch)
    llk, kl, aux = super().elbo_components(params, x, rng, step,
                                           training=training,
                                           mutables=mutables)
    if y is not None:
      y = jnp.asarray(y)
      if y.ndim == 1:  # integer labels -> one-hot for the onehot head
        y = jax.nn.one_hot(y.astype(jnp.int32), self.n_labels)
      qy = self._apply_module(params, "labels", self._labels_head2,
                              aux["z"], rng=rng, training=training)
      llk["llk_labels"] = masked_mean_llk(self.alpha * qy.log_prob(y), mask)
    return llk, kl, aux


class ALDA(amortizedLDA):
  """Alias variant (reference ``lda_vae.py:544``)."""
