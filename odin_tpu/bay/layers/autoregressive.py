"""Masked autoregressive dense network (generalized MADE / "MAN").

Reference: ``odin/bay/layers/autoregressive_layers.py`` (`AutoregressiveDense`
wrapping TFP's AutoregressiveNetwork mask machinery) used by
`DistributionDense(autoregressive=True)`
(``odin/bay/layers/dense_distribution.py:213-220,355-357``).

Semantics: map an input of any width to ``event_size * params`` outputs such
that the parameters of event dimension i depend only on input units whose
degree is < i — inputs get degrees cyclically (the MAN generalization that
lifts MADE's equal-width requirement).  Masks are constant numpy arrays
baked into the program: the masked matmuls are ordinary MXU matmuls with a
zero pattern, nothing data-dependent.

Output layout matches the reference's post-processing
(``dense_distribution.py:355-357``): parameter-major, i.e.
``[p0(dim0..dimE), p1(dim0..dimE), ...]`` — what the distribution builders
expect (locs first, then scales).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["AutoregressiveDense"]


def _degrees(n: int, event_size: int, is_input: bool) -> np.ndarray:
  """MADE degrees: inputs cycle 1..event_size; hidden units cycle
  1..event_size-1 (so every hidden unit can feed at least one output)."""
  if is_input or event_size <= 1:
    return (np.arange(n) % max(event_size, 1)) + 1
  return (np.arange(n) % max(event_size - 1, 1)) + 1


class AutoregressiveDense(nn.Module):
  """y[.., i*params : ] depends only on inputs with degree < i+1."""

  params: int
  event_size: int
  hidden_units: Sequence[int] = ()
  use_bias: bool = True
  activation: str = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    n_in = x.shape[-1]
    deg_prev = _degrees(n_in, self.event_size, is_input=True)
    h = x
    act = getattr(nn, self.activation) if self.activation != "linear" \
        else (lambda v: v)
    for li, width in enumerate(self.hidden_units):
      deg = _degrees(int(width), self.event_size, is_input=False)
      # hidden unit j sees inputs with degree <= deg[j]
      mask = (deg_prev[:, None] <= deg[None, :]).astype(np.float32)
      kernel = self.param(f"kernel_{li}", nn.initializers.glorot_normal(),
                          (h.shape[-1], int(width)))
      out = h @ (kernel * jnp.asarray(mask))
      if self.use_bias:
        out = out + self.param(f"bias_{li}", nn.initializers.zeros,
                               (int(width),))
      h = act(out)
      deg_prev = deg
    # output: event dim i (degree i+1) sees units with degree < i+1 (strict)
    deg_out = np.arange(1, self.event_size + 1)
    mask_out = (deg_prev[:, None] < deg_out[None, :]).astype(np.float32)
    # replicate the event mask across parameter slots, parameter-major
    mask_out = np.tile(mask_out, (1, self.params))  # (n_prev, params*event)
    kernel = self.param("kernel_out", nn.initializers.glorot_normal(),
                        (h.shape[-1], self.params * self.event_size))
    out = h @ (kernel * jnp.asarray(mask_out))
    if self.use_bias:
      out = out + self.param("bias_out", nn.initializers.zeros,
                             (self.params * self.event_size,))
    return out
