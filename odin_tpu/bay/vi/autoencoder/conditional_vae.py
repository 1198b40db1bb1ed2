"""Kingma M2 conditional VAEs.

Reference: ``odin/bay/vi/autoencoder/conditional_vae.py`` — `M2VAE` (:65),
`ConditionalM2VAE` (:235), `StructuredSemiVAE` (:535), `reparamsM3VAE`
(:569): the classifier q(y|x), conditional encoder q(z|x,y) and decoder
p(x|z,y); labelled data adds ``alpha * log q(y|x)``; unlabelled data either
uses relaxed/soft labels (M2VAE) or exact marginalization over classes
(ConditionalM2VAE, :196-235).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions.base import Independent
from odin_tpu.bay.distributions.continuous import Normal
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaGammaVAE, BetaVAE
from odin_tpu.bay.vi.autoencoder.multitask_vae import _unpack_ssl, masked_mean_llk
from odin_tpu.bay.vi.utils import marginalize_categorical_labels
from odin_tpu.networks.base import Dense, SequentialNetwork
from odin_tpu.networks.conditional_embedding import get_embedding

__all__ = ["M2VAE", "ConditionalM2VAE", "StructuredSemiVAE", "PriorRegressor",
           "reparamsM3VAE"]


class M2Core(nn.Module):
  """flax trunk of M2: classifier, conditional encoder/decoder embeddings
  (reference ``conditional_vae.py:80-160``)."""

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  labels: DistributionDense
  classifier: Any
  embed_dim: int = 128
  classify_on_features: bool = False
  n_classes: int = 10
  embedding_method: str = "projection"

  def setup(self):
    # submodules used across several methods must be declared in setup()
    e = self.embed_dim
    # label embedder selected from the conditional_embedding family
    # (reference ``conditional_vae.py:382-392`` builds y_to_qz / y_to_px
    # via get_embedding(embedding_method))
    emb_cls = get_embedding(self.embedding_method)
    self.x_to_qz = nn.Dense(e)
    self.y_to_qz = emb_cls(n_classes=self.n_classes, event_shape=(e,))
    self.xy_to_qz_net = SequentialNetwork(
        (Dense(e, "relu"), Dense(e, "relu")), name="xy_to_qz")
    self.z_to_px = nn.Dense(e)
    self.y_to_px = emb_cls(n_classes=self.n_classes, event_shape=(e,))
    self.zy_to_px_net = SequentialNetwork(
        (Dense(e, "relu"), Dense(e, "relu")), name="zy_to_px")

  def classify(self, x, training: bool = False):
    if self.classify_on_features:
      # M3 reparameterization: classifier consumes shared encoder features
      x = self.encoder(x, training=training)
      x = x.reshape(x.shape[0], -1)
    h = self.classifier(x, training=training)
    return self.labels(h, training=training)

  def encode_xy(self, x, y, training: bool = False):
    """q(z | x, y)."""
    h_x = self.encoder(x, training=training)
    h_x = h_x.reshape(h_x.shape[0], -1)
    h_x = self.x_to_qz(h_x)
    h_y = self.y_to_qz(y)
    h = jnp.concatenate([h_x, h_y], axis=-1)
    h = self.xy_to_qz_net(h, training=training)
    return self.latents(h, training=training)

  def decode_zy(self, z, y, training: bool = False):
    """p(x | z, y)."""
    h_z = self.z_to_px(z)
    h_y = self.y_to_px(y)
    h = jnp.concatenate([h_z, h_y], axis=-1)
    h = self.zy_to_px_net(h, training=training)
    h = self.decoder(h, training=training)
    return self.observation(h, training=training)

  def encode(self, x, training: bool = False):
    """q(z|x, y~q(y|x)) — the API-parity single-input encode."""
    qy = self.classify(x, training=training)
    return self.encode_xy(x, qy.mean(), training=training)

  def __call__(self, x, training: bool = False):
    qy = self.classify(x, training=training)
    y = qy.mean()
    qz = self.encode_xy(x, y, training=training)
    z = qz.mean()
    px = self.decode_zy(z, y, training=training)
    return px, qz, qy


class M2VAE(BetaGammaVAE):
  """M2 with relaxed (soft) labels on the unlabelled path
  (reference ``conditional_vae.py:65-233``)."""

  def __init__(self,
               labels: Optional[RVconf] = None,
               classifier: Sequence[int] = (1024, 1024, 1024, 1024),
               activation: str = "relu",
               alpha: float = 10.0,
               embed_dim: int = 128,
               embedding_method: str = "projection",
               **kwargs):
    if labels is None:
      labels = RVconf(10, "onehot", projection=True, name="digits")
    self.alpha = float(alpha)
    self.n_classes = labels.event_size
    self.embed_dim = int(embed_dim)
    # label-embedder choice (reference ConditionalM2VAE ``:324-345``);
    # 'projection' preserves soft-label gradients (the M2 relaxed path)
    self.embedding_method = str(embedding_method)
    self._classifier_units = tuple(int(u) for u in classifier)
    self._classifier_activation = activation
    kwargs["labels"] = labels
    super().__init__(**kwargs)
    self.labels_prior = self.labels_conf.create_prior()

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  def _build_core(self) -> nn.Module:
    from odin_tpu.networks.base import Flatten
    clf = SequentialNetwork(
        (Flatten(),) + tuple(Dense(u, self._classifier_activation)
                             for u in self._classifier_units),
        name="classifier")
    return M2Core(encoder=self.encoder_net, decoder=self.decoder_net,
                  latents=self.latents_head,
                  observation=self.observation_head,
                  labels=self.labels_head,
                  classifier=clf, embed_dim=self.embed_dim,
                  n_classes=self.n_classes,
                  embedding_method=self.embedding_method)

  def classify(self, x, params=None, seed: int = 0):
    params = params or self._params_of()
    return self._apply(params, "classify", jnp.asarray(x),
                       rng=jax.random.PRNGKey(seed))

  def __call__(self, x, training: bool = False, seed: int = 0):
    params = self._params_of()
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    px, qz, qy = self.core.apply({"params": params["vae"]}, jnp.asarray(x),
                                 training=training,
                                 rngs={"dropout": r1, "sample": r2})
    return px, qz

  def decode(self, z, params: Optional[dict] = None, training: bool = False,
             seed: int = 0, y: Optional[jax.Array] = None):
    """p(x|z, y); y defaults to a uniform mixture over classes."""
    params = params or self._params_of()
    z = jnp.asarray(z)
    if y is None:
      y = jnp.full(z.shape[:-1] + (self.n_classes,), 1.0 / self.n_classes)
    return self._apply(params, "decode_zy", z, y,
                       rng=jax.random.PRNGKey(seed), training=training)

  def _components_xy(self, params, x, y, rng, training, mutables):
    k1, k2 = jax.random.split(rng)
    qz = self._apply(params, "encode_xy", x, y, rng=k1, training=training,
                     mutables=mutables)
    z = qz.sample(k2)
    px = self._apply(params, "decode_zy", z, y, rng=k1, training=training,
                     mutables=mutables)
    llk_x = px.log_prob(x)
    kl_z = kl_divergence(qz, self.latents_prior, analytic=self.analytic,
                         q_sample=z, reverse=self.reverse,
                         free_bits=self.free_bits)
    return llk_x, kl_z, qz, px, z

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2 = jax.random.split(rng)
    qy = self._apply(params, "classify", x, rng=k1, training=training,
                     mutables=mutables)
    if y is None:
      # fully unsupervised: soft labels from the classifier
      y_soft = qy.mean()
      llk_x, kl_z, qz, px, z = self._components_xy(
          params, x, y_soft, k2, training, mutables)
      llk = {"llk_image_u": llk_x,
             "H_qy": -jnp.sum(qy.mean() * jnp.log(qy.mean() + 1e-6), -1)}
      kl = {"kl_latents_u": kl_z}
    else:
      y_soft = qy.mean()
      y_mix = y if mask is None else (
          mask.reshape(-1, 1) * y + (1 - mask.reshape(-1, 1)) * y_soft)
      llk_x, kl_z, qz, px, z = self._components_xy(
          params, x, y_mix, k2, training, mutables)
      llk = {
          "llk_image": llk_x,
          "llk_qy": masked_mean_llk(self.alpha * qy.log_prob(y), mask),
          "H_qy": -jnp.sum(qy.mean() * jnp.log(qy.mean() + 1e-6), -1),
      }
      kl = {"kl_latents": kl_z}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, qy=qy)


class ConditionalM2VAE(M2VAE):
  """M2 with exact marginalization over y for unlabelled rows
  (Kingma et al. 2014, Eq. 7; reference ``conditional_vae.py:235-533``):
  ``-U(x) = Σ_y q(y|x) (-L(x,y)) - H(q(y|x))``.

  The reference defaults to the 'sequential' label embedder here
  (``conditional_vae.py:325``): the marginalized path always feeds exact
  one-hot labels, so the argmax-folding lookup embedders are safe."""

  def __init__(self, embedding_method: str = "sequential", **kwargs):
    super().__init__(embedding_method=embedding_method, **kwargs)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2 = jax.random.split(rng)
    qy = self._apply(params, "classify", x, rng=k1, training=training,
                     mutables=mutables)
    probs = qy.mean()  # (B, K)
    # marginalize: tile x K times with each one-hot label
    x_m, y_m = marginalize_categorical_labels(x, self.n_classes)
    llk_x, kl_z, qz, px, z = self._components_xy(
        params, x_m, y_m, k2, training, mutables)
    llk_x = llk_x.reshape(-1, self.n_classes)
    kl_z = kl_z.reshape(-1, self.n_classes)
    elbo_xy = llk_x - kl_z  # (B, K)
    if y is not None and mask is not None:
      w = mask.reshape(-1, 1) * y + (1 - mask.reshape(-1, 1)) * probs
    elif y is not None:
      w = y
    else:
      w = probs
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1)
    llk = {"marginal_elbo": jnp.sum(w * elbo_xy, -1), "H_qy": entropy}
    if y is not None:
      llk["llk_qy"] = masked_mean_llk(self.alpha * qy.log_prob(y), mask)
    kl = {}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y, qy=qy)


class StructuredSemiVAE(M2VAE):
  """Structured semi-supervised VAE (reference ``conditional_vae.py:535``) —
  the M2 graph with a separate deterministic style path; realized here as M2
  with a doubled latent capacity (structure + style)."""

  def __init__(self, latents: Optional[RVconf] = None, **kwargs):
    if latents is None:
      latents = RVconf(64, "mvndiag", projection=True, name="latents")
    super().__init__(latents=latents, **kwargs)


class PriorRegressor(nn.Module):
  """Learnable per-class diag-normal label prior p(z_c | y) (reference
  ``conditional_vae.py:547-569``): four learnable vectors interpolate the
  prior's loc/scale between the 'true' and 'false' settings of each class
  bit, so the prior over the denotation latents is LEARNED per class rather
  than fixed at N(0, I)."""

  n_classes: int

  @nn.compact
  def __call__(self, y, training: bool = False):
    dim = self.n_classes
    loc_t = self.param("diag_loc_true", nn.initializers.zeros, (dim,))
    loc_f = self.param("diag_loc_false", nn.initializers.zeros, (dim,))
    sc_t = self.param("diag_scale_true", nn.initializers.ones, (dim,))
    sc_f = self.param("diag_scale_false", nn.initializers.ones, (dim,))
    loc = y * loc_t + (1.0 - y) * loc_f
    scale = jnp.clip(jax.nn.softplus(y * sc_t + (1.0 - y) * sc_f),
                     1e-3, 1e12)
    return Independent(Normal(loc, scale), 1)


class M3Core(M2Core):
  """M2 trunk + the M3 reparameterization pieces (reference
  ``conditional_vae.py:569-700``): a second 'denotations' latent space z_c
  of dim n_classes inferred from the encoder features, a classifier that
  consumes z_c (labels are inferred from latents, not pixels), and the
  learnable `PriorRegressor` p(z_c|y)."""

  denotations: Any = None

  def setup(self):
    super().setup()
    self.regressor = PriorRegressor(self.denotations.event_size)

  def encode_m3(self, x, training: bool = False):
    """x -> (q(z|x), q(z_c|x)) — shared encoder trunk, two heads."""
    h = self.encoder(x, training=training)
    h = h.reshape(h.shape[0], -1)
    qz = self.latents(h, training=training)
    qzc = self.denotations(h, training=training)
    return qz, qzc

  def classify_zc(self, z_c, training: bool = False):
    """q(y | z_c) — the M3 classifier consumes denotation latents."""
    h = self.classifier(z_c, training=training)
    return self.labels(h, training=training)

  def prior_zc(self, y, training: bool = False):
    """p(z_c | y) from the learnable regressor."""
    return self.regressor(y, training=training)

  def classify(self, x, training: bool = False):
    """API-parity single-input classify: x -> z_c mean -> q(y|z_c)."""
    _, qzc = self.encode_m3(x, training=training)
    return self.classify_zc(qzc.mean(), training=training)

  def encode(self, x, training: bool = False):
    """Joint posterior over [z, z_c] as ONE diag-normal — its zdim +
    n_classes width is exactly what decode_zy consumes.  M2's inherited
    ``encode_xy`` path must NOT be used here: M3 never traces the
    x_to_qz/y_to_qz modules, so their params do not exist."""
    qz, qzc = self.encode_m3(x, training=training)
    loc = jnp.concatenate([qz.mean(), qzc.mean()], -1)
    scale = jnp.sqrt(jnp.concatenate([qz.variance(), qzc.variance()], -1))
    return Independent(Normal(loc, scale), 1)

  def __call__(self, x, training: bool = False):
    qz, qzc = self.encode_m3(x, training=training)
    qy = self.classify_zc(qzc.mean(), training=training)
    # touch the learnable prior so init through __call__ creates its params
    self.regressor(qy.mean(), training=training)
    z = jnp.concatenate([qz.mean(), qzc.mean()], axis=-1)
    px = self.decode_zy(z, qy.mean(), training=training)
    return px, qz, qy


class reparamsM3VAE(M2VAE):
  """M3 reparameterization (reference ``conditional_vae.py:569-700``):
  labels are inferred from a dedicated 'denotations' latent space z_c
  (classifier consumes z_c, never pixels), and the prior over z_c is the
  LEARNABLE per-class `PriorRegressor` p(z_c|y) — its diag-normal loc/scale
  parameters train jointly with the ELBO (reference ``:547-569``).  The
  exclusive latents z keep the fixed N(0, I) prior."""

  def _build_core(self) -> nn.Module:
    clf = SequentialNetwork(
        tuple(Dense(u, self._classifier_activation)
              for u in self._classifier_units[:2]),
        name="classifier_m3")
    denotations = RVconf(self.n_classes, "normal", projection=True,
                         name="denotations").create_posterior()
    return M3Core(encoder=self.encoder_net, decoder=self.decoder_net,
                  latents=self.latents_head,
                  observation=self.observation_head,
                  labels=self.labels_head,
                  classifier=clf, embed_dim=self.embed_dim,
                  n_classes=self.n_classes,
                  embedding_method=self.embedding_method,
                  denotations=denotations)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y, mask = _unpack_ssl(batch)
    k1, k2, k3 = jax.random.split(rng, 3)
    qz, qzc = self._apply(params, "encode_m3", x, rng=k1, training=training,
                          mutables=mutables)
    z = qz.sample(k2)
    z_c = qzc.sample(k3)
    qy = self._apply(params, "classify_zc", z_c, rng=k1, training=training,
                     mutables=mutables)
    y_soft = qy.mean()
    if y is None:
      y_mix = y_soft
    elif mask is None:
      y_mix = y
    else:
      y_mix = mask.reshape(-1, 1) * y + (1 - mask.reshape(-1, 1)) * y_soft
    # learnable label prior p(z_c|y)
    pzc_y = self._apply(params, "prior_zc", y_mix, rng=k1, training=training,
                        mutables=mutables)
    px = self._apply(params, "decode_zy",
                     jnp.concatenate([z, z_c], axis=-1), y_mix, rng=k1,
                     training=training, mutables=mutables)
    llk_x = px.log_prob(x)
    kl_z = kl_divergence(qz, self.latents_prior, analytic=self.analytic,
                         q_sample=z, reverse=self.reverse,
                         free_bits=self.free_bits)
    # analytic normal-normal KL keeps gradients flowing into the regressor
    kl_zc = kl_divergence(qzc, pzc_y, analytic=self.analytic,
                          q_sample=z_c, reverse=self.reverse,
                          free_bits=self.free_bits)
    llk = {"llk_image": llk_x,
           "H_qy": -jnp.sum(y_soft * jnp.log(y_soft + 1e-6), -1)}
    if y is not None:
      llk["llk_qy"] = masked_mean_llk(self.alpha * qy.log_prob(y), mask)
    kl = {"kl_latents": kl_z, "kl_denotations": kl_zc}
    return llk, kl, dict(qz=qz, qzc=qzc, px=px, z=z, x=x, y=y, qy=qy)
