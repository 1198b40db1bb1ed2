"""Mixed-membership models.

Reference: ``odin/bay/mixed_membership`` — the amortized
`LatentDirichletAllocation` (re-exported here from the VAE zoo) and the
`GradeMembershipModel` (``grade_membership_model.py:17``): a Grade-of-
Membership model for questionnaire data where each respondent is a mixture
over K latent profiles and each profile fixes a per-question answer
distribution.

TPU redesign: the reference loops a separate Keras encoder/decoder per
question in Python; here every per-question parameter is stacked on a
leading question axis and the whole sheet is processed by THREE einsums
(encoder MLP, concentration head, profile->answer mixture) — one fused
batched-matmul program on the MXU instead of Q small graphs.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.bay.distributions.continuous import Dirichlet
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.lda_vae import (  # noqa: F401
    ALDA,
    LatentDirichletDecoder,
    amortizedLDA,
    auxiliaryLDA,
    nonlinearLDA,
)
from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VariationalAutoencoder,
)

LatentDirichletAllocation = LatentDirichletDecoder  # reference class name

__all__ = ["LatentDirichletAllocation", "LatentDirichletDecoder",
           "amortizedLDA", "auxiliaryLDA", "nonlinearLDA", "ALDA",
           "GradeMembershipModel"]


class _GoMCore(nn.Module):
  """Question-stacked trunk: one-hot answers -> per-question Dirichlet
  posterior over profiles; profiles -> answer probabilities."""

  n_questions: int
  n_answers: int
  n_components: int
  hidden: Tuple[int, ...] = (16, 16)

  def setup(self):
    Q, A, K = self.n_questions, self.n_answers, self.n_components
    init = nn.initializers.glorot_normal()
    dims = (A,) + tuple(self.hidden)
    self.enc_w = [self.param(f"enc_w{i}", init, (Q, dims[i], dims[i + 1]))
                  for i in range(len(self.hidden))]
    self.enc_b = [self.param(f"enc_b{i}", nn.initializers.zeros,
                             (Q, dims[i + 1]))
                  for i in range(len(self.hidden))]
    self.conc_w = self.param("conc_w", init, (Q, dims[-1], K))
    self.conc_b = self.param("conc_b", nn.initializers.zeros, (Q, K))
    # per-question profile -> answer logits (reference
    # ``grade_membership_model.py:73`` `topics_words_logits`)
    self.profile_logits = self.param("profile_logits", init, (Q, K, A))

  def encode(self, x, training: bool = False) -> Dirichlet:
    h = jax.nn.one_hot(jnp.asarray(x).astype(jnp.int32), self.n_answers)
    for w, b in zip(self.enc_w, self.enc_b):
      h = jax.nn.relu(jnp.einsum("bqi,qij->bqj", h, w) + b)
    conc = jax.nn.softplus(jnp.einsum("bqi,qik->bqk", h, self.conc_w) +
                           self.conc_b)
    # clip_for_stable of the reference's DirichletLayer
    return Dirichlet(jnp.clip(conc, 1e-3, 1e3))

  def decode(self, theta, training: bool = False):
    probs = jax.nn.softmax(self.profile_logits, axis=-1)     # (Q, K, A)
    answer = jnp.einsum("...qk,qka->...qa", theta, probs)
    return jnp.clip(answer, 1e-4, 1.0 - 1e-4)

  def __call__(self, x, training: bool = False):
    q = self.encode(x, training=training)
    return self.decode(q.mean(), training=training), q


class GradeMembershipModel(VariationalAutoencoder):
  """Grade-of-Membership model (reference
  ``odin/bay/mixed_membership/grade_membership_model.py:17``).

  Inputs are integer answer sheets ``(batch, n_questions)`` with values in
  ``[0, n_answers)``.  Each respondent gets a per-question Dirichlet
  posterior over ``n_components`` latent profiles (amortized, shared prior
  ``Dirichlet(components_prior)``), and each profile fixes an answer
  distribution per question; the ELBO averages per-question
  ``llk - KL`` exactly like the reference's loss.
  """

  def __init__(self,
               n_questions: int,
               n_answers: int,
               n_components: int = 10,
               components_prior: float = 0.7,
               encoder_layers: Tuple[int, ...] = (16, 16),
               warmup_steps: int = 0,
               **kwargs):
    self.n_questions = int(n_questions)
    self.n_answers = int(n_answers)
    self.n_components = int(n_components)
    self.encoder_layers = tuple(int(u) for u in encoder_layers)
    kwargs.pop("latents", None)
    kwargs.pop("observation", None)
    kwargs.setdefault("input_shape", (self.n_questions,))
    super().__init__(
        latents=RVconf(self.n_components, "dirichlet", projection=True,
                       name="profiles"),
        observation=RVconf((self.n_questions,), "deterministic",
                           projection=False, name="answers"),
        **kwargs)
    self.components_prior = float(components_prior)
    # linear KL warm-up: a sharp Dirichlet posterior costs more KL than one
    # question's llk can immediately repay, so cold-started training falls
    # into the collapsed (marginal-predicting) local optimum; annealing the
    # KL in over `warmup_steps` lets the profiles form first (not in the
    # reference, which reports no training results for this model)
    self.warmup_steps = int(warmup_steps)
    # one shared prior for every question (reference `prior_logit`,
    # non-trainable) — built eagerly, never inside a trace
    self._priors["latents"] = Dirichlet(
        jnp.full((self.n_components,),
                 np.clip(self.components_prior, 1e-3, 1e3), jnp.float32))

  def _build_core(self) -> nn.Module:
    return _GoMCore(n_questions=self.n_questions, n_answers=self.n_answers,
                    n_components=self.n_components,
                    hidden=self.encoder_layers)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    q = self._apply(params, "encode", x, rng=k1, training=training,
                    mutables=mutables)                    # batch (B, Q)
    theta = q.sample(k2)                                  # (B, Q, K)
    answer_probs = self._apply(params, "decode", theta, rng=k1,
                               training=training, mutables=mutables)
    onehot = jax.nn.one_hot(jnp.asarray(x).astype(jnp.int32), self.n_answers)
    llk_q = jnp.sum(onehot * jnp.log(answer_probs), axis=-1)   # (B, Q)
    kl_q = kl_divergence(q, self.latents_prior, analytic=self.analytic,
                         q_sample=theta, reverse=self.reverse)  # (B, Q)
    if self.warmup_steps > 0 and training:
      kl_q = kl_q * jnp.minimum(
          jnp.asarray(step, jnp.float32) / self.warmup_steps, 1.0)
    # the reference's loss normalizes the summed per-question ELBO by Q
    llk = {"llk_answers": jnp.mean(llk_q, axis=-1)}
    kl = {"kl_profiles": jnp.mean(kl_q, axis=-1)}
    return llk, kl, dict(qz=q, px=None, z=theta, x=x, y=y,
                         answer_probs=answer_probs)

  # -- reference public surface ---------------------------------------------
  def predict(self, x, seed: int = 0) -> np.ndarray:
    """Most-likely answer per question under the posterior-mean membership
    (the reference `call`'s output)."""
    q = self.encode(jnp.asarray(x), seed=seed)
    probs = self._apply(self._params_of(), "decode", q.mean())
    return np.asarray(jnp.argmax(probs, axis=-1))

  def transform(self, x, seed: int = 0, per_question: bool = False):
    """Posterior-mean membership of each respondent: ``(B, K)`` (averaged
    over questions, rows sum to 1) or per-question ``(B, Q, K)``."""
    q = self.encode(jnp.asarray(x), seed=seed)
    theta = q.mean()
    if not per_question:
      theta = jnp.mean(theta, axis=1)
      theta = theta / jnp.maximum(jnp.sum(theta, -1, keepdims=True), 1e-12)
    return np.asarray(theta)

  def get_profiles(self) -> np.ndarray:
    """Per-question answer distribution of each latent profile
    ``(Q, K, A)``."""
    logits = self._params_of()["vae"]["profile_logits"]
    return np.asarray(jax.nn.softmax(logits, axis=-1))
