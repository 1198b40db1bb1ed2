"""KL machinery and distribution helpers.

Reference semantics: ``odin/bay/helpers.py:177-283`` (`kl_divergence`) —
analytic KL when available, Monte-Carlo ``E_q[log q - log p]`` otherwise,
`reverse` to compute KL(p||q) instead, and per-dimension free-bits clamping
``max(kl, free_bits)``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from odin_tpu.bay.distributions import Batchwise, Distribution
from odin_tpu.bay.distributions.base import kl_registry_lookup

__all__ = ["kl_divergence", "concat_distributions"]


def kl_divergence(q: Distribution,
                  p: Distribution,
                  analytic: bool = False,
                  q_sample: Optional[Union[int, jax.Array]] = None,
                  seed: Optional[jax.Array] = None,
                  reverse: bool = True,
                  free_bits: Optional[float] = None) -> jax.Array:
  """KL divergence between two distributions.

  Args:
    q: posterior distribution.
    p: prior distribution.
    analytic: use the closed-form KL when registered.
    q_sample: either pre-drawn samples from q (an array) or an int number of
      MC samples to draw (requires `seed`).
    reverse: if True computes KL(q||p) (the standard ELBO direction, matching
      the reference default); if False computes KL(p||q).
    free_bits: clamp the KL to at least ``free_bits * n_event_units``
      (reference ``helpers.py:279-281``: ``maximum(kl, free_bits *
      prod(q.event_shape))`` — the Kingma et al. 2016 per-unit budget).
  """
  a, b = (q, p) if reverse else (p, q)
  kl = None
  if analytic and kl_registry_lookup(type(a), type(b)) is not None:
    kl = a.kl_divergence(b, analytic=True)
  else:
    if isinstance(q_sample, (int, float)):
      if seed is None:
        raise ValueError("integer q_sample requires a seed")
      samples = a.sample(seed, (int(q_sample),))
    elif q_sample is None:
      if seed is None:
        raise ValueError("MC KL requires q_sample or seed")
      samples = a.sample(seed, (1,))
    else:
      samples = q_sample
    kl = jnp.mean(a.log_prob(samples) - b.log_prob(samples), axis=0) \
        if samples.ndim > len(a.batch_shape) + len(a.event_shape) \
        else a.log_prob(samples) - b.log_prob(samples)
  if free_bits is not None:
    units = 1.0
    for d in a.event_shape:
      units *= float(d)
    kl = jnp.maximum(kl, jnp.asarray(free_bits * units, kl.dtype))
  return kl


def concat_distributions(distributions: Sequence[Distribution],
                         axis: int = 0) -> Distribution:
  """Concatenate same-family distributions along a batch axis.

  Where the reference rebuilds a single TFP distribution by concatenating
  parameters (``odin/bay/helpers.py:511``), the pytree design makes this a
  tree_map when structures match, falling back to `Batchwise`.
  """
  distributions = list(distributions)
  if len(distributions) == 1:
    return distributions[0]
  first = distributions[0]
  try:
    treedefs = {jax.tree_util.tree_structure(d) for d in distributions}
    if len(treedefs) == 1:
      return jax.tree_util.tree_map(
          lambda *xs: jnp.concatenate(xs, axis=axis), *distributions)
  except Exception:
    pass
  return Batchwise(distributions, axis=axis)


class KLdivergence:
  """Freeze `kl_divergence` arguments for later calls
  (reference ``bay/helpers.py:285``): returns 0 when no prior is given.

  In the reference this object is attached to posteriors returned by
  `DistributionDense`; here distributions are immutable pytrees, so it is a
  standalone helper kept for API fidelity.
  """

  def __init__(self, posterior: Distribution,
               prior: Optional[Distribution] = None,
               analytic: bool = False,
               sample_shape=(),
               reverse: bool = True,
               free_bits: Optional[float] = None,
               seed: int = 1):
    self.posterior = posterior
    self.prior = prior
    self.analytic = bool(analytic)
    self.sample_shape = sample_shape
    self.reverse = bool(reverse)
    self.free_bits = free_bits
    self.seed = int(seed)

  def __call__(self, prior: Optional[Distribution] = None,
               analytic: Optional[bool] = None,
               sample_shape="__default__",
               reverse: Optional[bool] = None,
               free_bits="__default__"):
    prior = prior if prior is not None else self.prior
    if prior is None:
      return jnp.zeros(())
    analytic = self.analytic if analytic is None else bool(analytic)
    reverse = self.reverse if reverse is None else bool(reverse)
    if sample_shape == "__default__":
      sample_shape = self.sample_shape
    if free_bits == "__default__":
      free_bits = self.free_bits
    q_sample = None
    if not analytic:
      shape = (sample_shape,) if isinstance(sample_shape, int) \
          else tuple(sample_shape)
      q_sample = self.posterior.sample(jax.random.PRNGKey(self.seed),
                                       shape or (1,))
    return kl_divergence(self.posterior, prior, analytic=analytic,
                         q_sample=q_sample, reverse=reverse,
                         free_bits=free_bits)

  def __repr__(self):
    return (f"KLdivergence(analytic={self.analytic}, "
            f"reverse={self.reverse}, free_bits={self.free_bits})")


__all__.append("KLdivergence")
