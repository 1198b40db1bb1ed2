"""Model explanation: adversarial attacks + DeepDream.

Reference: ``odin/explain`` — `AdversarialAttack` (FGSM-style,
``adversarial_attack.py:33``), `DeepDream` (``deep_dream.py:39``) — both are
gradient ascents on inputs; in JAX they are three-line jitted loops.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fgsm_attack", "pgd_attack", "AdversarialAttack", "DeepDream"]


def fgsm_attack(loss_fn: Callable, x, epsilon: float = 0.01,
                clip: tuple = (0.0, 1.0)):
  """x_adv = x + eps * sign(grad_x loss) (reference `AdversarialAttack`)."""
  g = jax.grad(loss_fn)(jnp.asarray(x))
  x_adv = jnp.asarray(x) + epsilon * jnp.sign(g)
  return jnp.clip(x_adv, *clip)


def pgd_attack(loss_fn: Callable, x, epsilon: float = 0.03,
               step_size: float = 0.007, n_steps: int = 10,
               clip: tuple = (0.0, 1.0)):
  """Projected gradient descent attack (iterated FGSM with an L_inf ball)."""
  x0 = jnp.asarray(x)

  @jax.jit
  def body(i, x_adv):
    g = jax.grad(loss_fn)(x_adv)
    x_adv = x_adv + step_size * jnp.sign(g)
    x_adv = jnp.clip(x_adv, x0 - epsilon, x0 + epsilon)
    return jnp.clip(x_adv, *clip)

  return jax.lax.fori_loop(0, n_steps, body, x0)


class AdversarialAttack:
  """Attack a VAE/classifier (reference ``adversarial_attack.py:33``):
  maximizes the model's loss w.r.t. the input."""

  def __init__(self, model, epsilon: float = 0.01, method: str = "fgsm",
               n_steps: int = 10):
    self.model = model
    self.epsilon = float(epsilon)
    self.method = method
    self.n_steps = int(n_steps)

  def _loss(self, x):
    params = self.model._params_of()
    llk, kl, _ = self.model.elbo_components(
        params, x, jax.random.PRNGKey(0), 0)
    return -jnp.mean(self.model.elbo(llk, kl))

  def attack(self, x) -> np.ndarray:
    if self.method == "fgsm":
      return np.asarray(fgsm_attack(self._loss, x, self.epsilon))
    return np.asarray(pgd_attack(self._loss, x, self.epsilon,
                                 self.epsilon / 3, self.n_steps))


class DeepDream:
  """Gradient-ascent feature amplification (reference ``deep_dream.py:39``):
  maximize the norm of chosen activations w.r.t. the input."""

  def __init__(self, feature_fn: Callable, step_size: float = 0.01,
               n_steps: int = 50):
    self.feature_fn = feature_fn
    self.step_size = float(step_size)
    self.n_steps = int(n_steps)

  def dream(self, x, clip: tuple = (0.0, 1.0)) -> np.ndarray:
    def objective(x):
      h = self.feature_fn(x)
      return jnp.mean(h * h)

    @jax.jit
    def body(i, x):
      g = jax.grad(objective)(x)
      g = g / (jnp.std(g) + 1e-8)
      return jnp.clip(x + self.step_size * g, *clip)

    return np.asarray(jax.lax.fori_loop(0, self.n_steps, body,
                                        jnp.asarray(x)))
