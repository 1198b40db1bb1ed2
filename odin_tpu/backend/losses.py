"""Similarity / metric-learning losses and regularizers.

Reference: ``odin/backend/losses.py`` — contrastive/triplet losses, cosine
similarity scoring, Bayes (class-prior-weighted) cross-entropy, Jacobian and
correntropy regularizers.  The reference file predates TF2 (several functions
still call TF1-only ops and ``triplet_loss`` is an empty ``pass``); this
module implements the *documented* semantics as pure jittable JAX functions
and fixes the transcription bugs noted per-function.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "contrastive_loss",
    "triplet_loss",
    "cosine_similarity",
    "bayes_crossentropy",
    "bayes_binary_crossentropy",
    "jacobian_regularize",
    "correntropy_regularize",
]

EPS = 1e-8


def contrastive_loss(y_true, y_pred, margin: float = 1.0):
  """Hadsell-Chopra-LeCun contrastive loss (reference ``losses.py:12``).

  ``y_true`` in {0, 1} marks similar pairs, ``y_pred`` is the embedding
  distance of the pair: similar pairs are pulled (``d^2``), dissimilar pairs
  pushed below the margin (``max(margin - d, 0)^2``).
  """
  y_true = jnp.asarray(y_true, jnp.float32)
  d = jnp.asarray(y_pred, jnp.float32)
  return jnp.mean(y_true * jnp.square(d) +
                  (1.0 - y_true) * jnp.square(jnp.maximum(margin - d, 0.0)))


def triplet_loss(anchor, positive, negative, margin: float = 1.0):
  """FaceNet triplet loss ``max(0, d(a,p)^2 - d(a,n)^2 + margin)``.

  The reference declares this (``losses.py:24``) but never implemented it
  (the body is ``pass``); this is the standard Schroff'15 semantics.
  """
  ap = jnp.sum(jnp.square(anchor - positive), axis=-1)
  an = jnp.sum(jnp.square(anchor - negative), axis=-1)
  return jnp.mean(jnp.maximum(ap - an + margin, 0.0))


def cosine_similarity(y_true, y_pred, unit_norm: bool = True,
                      one_vs_all: bool = True):
  """Cosine score matrix between enrollment and test vectors (reference
  ``losses.py:63``).

  With ``one_vs_all`` the result is the ``(n_enroll, n_test)`` score matrix
  "comparing all models against all tests" (the reference's documented
  intent; its TF1 body transposed the wrong operand).  With
  ``one_vs_all=False`` it returns the per-pair cosine *distance*
  ``1 - <t, p>`` with shape ``(n, 1)``, matching the reference branch.
  """
  t = jnp.asarray(y_true, jnp.float32)
  p = jnp.asarray(y_pred, jnp.float32)
  if unit_norm:
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), EPS)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), EPS)
  if one_vs_all:
    return t @ p.T
  return 1.0 - jnp.sum(t * p, axis=-1, keepdims=True)


def bayes_crossentropy(y_true, y_pred, nb_classes: int | None = None):
  """Class-prior-weighted ("Bayes") cross-entropy (reference
  ``losses.py:108``): each class's log-likelihood is divided by the class's
  empirical probability in the batch, so rare classes contribute as much as
  frequent ones; the sum is scaled by ``1 / nb_classes``.

  ``y_pred`` holds probabilities.  1-D / single-column predictions are
  treated as binary ``[1-p, p]``; integer ``y_true`` is one-hot encoded
  (``nb_classes`` required in that case, as in the reference).
  """
  y_pred = jnp.asarray(y_pred, jnp.float32)
  y_true = jnp.asarray(y_true)
  if y_pred.ndim == 1 or y_pred.shape[-1] == 1:
    if y_pred.ndim == 1:
      y_pred = y_pred[:, None]
    y_pred = jnp.concatenate([1.0 - y_pred, y_pred], axis=-1)
  if y_true.ndim == 1:
    if nb_classes is None:
      raise ValueError("y_true is not one-hot encoded: provide nb_classes")
    y_true = jax.nn.one_hot(y_true.astype(jnp.int32), nb_classes)
  elif nb_classes is None:
    nb_classes = y_true.shape[-1]
  y_true = y_true.astype(jnp.float32)
  y_pred = jnp.clip(y_pred, EPS, 1.0 - EPS)
  # empirical class prior of the batch, clipped like the predictions
  prior = jnp.sum(y_true, axis=0)
  prior = jnp.clip(prior / jnp.maximum(jnp.sum(prior), EPS), EPS, 1.0 - EPS)
  loss = -jnp.sum(y_true * jnp.log(y_pred) / prior, axis=-1) / nb_classes
  return jnp.mean(loss)


def bayes_binary_crossentropy(y_true, y_pred):
  """Binary special case of :func:`bayes_crossentropy` (reference
  ``losses.py:144``)."""
  y_pred = jnp.asarray(y_pred, jnp.float32)
  if y_pred.ndim == 1:
    y_pred = y_pred[:, None]
  y_pred = jnp.concatenate([1.0 - y_pred, y_pred], axis=-1)
  y_true = jax.nn.one_hot(jnp.asarray(y_true).astype(jnp.int32), 2)
  return bayes_crossentropy(y_true, y_pred, nb_classes=2)


def jacobian_regularize(hidden, params):
  """Contractive-autoencoder Jacobian penalty for a sigmoid hidden layer
  (reference ``losses.py:153``): with ``h' = h * (1 - h)`` the Frobenius
  norm of the Jacobian ``J_ij = h'_j W_ij`` is penalized, averaged over the
  minibatch.

  ``hidden``: (batch, n_hidden) activations; ``params``: (n_in, n_hidden)
  weight matrix of the layer.
  """
  h = jnp.asarray(hidden, jnp.float32)
  w = jnp.asarray(params, jnp.float32)
  hp = h * (1.0 - h)                       # (B, H)
  jac = hp[:, None, :] * w[None, :, :]     # (B, D, H)
  return jnp.sum(jnp.square(jac)) / h.shape[0]


def correntropy_regularize(x, sigma: float = 1.0):
  """Correntropy-induced regularizer (reference ``losses.py:165``; original
  in EderSantana/seya): ``-sum_j mean_i exp(-x_ij^2 / sigma) /
  sqrt(2 pi sigma)``.  The reference body dropped the minus sign inside the
  exponent during transcription (making the loss explode); this implements
  the cited original.
  """
  x = jnp.asarray(x, jnp.float32)
  return (-jnp.sum(jnp.mean(jnp.exp(-jnp.square(x) / sigma), axis=0)) /
          jnp.sqrt(2.0 * jnp.pi * sigma))
