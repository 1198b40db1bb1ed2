"""Math utilities (reference: ``odin/backend/maths.py:17-694``).

Only the ops not already provided by jnn/jnp are kept: length-normalization,
whitening, softplus inverse, stable log variants.  They accept jnp or NumPy
arrays and stay pure/traceable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["softplus_inverse", "length_norm", "log_norm", "whitening", "logsumexp_mean"]


def softplus_inverse(x):
  """Inverse of softplus: log(exp(x) - 1), numerically stable.

  Reference: ``odin/backend/maths.py`` (`softplus_inverse`).
  """
  x = jnp.asarray(x)
  return x + jnp.log(-jnp.expm1(-x))


def length_norm(x, axis: int = -1, epsilon: float = 1e-12, ord: int = 2):
  """Unit-length normalization along `axis` (i-vector post-processing;
  reference ``odin/backend/maths.py`` `length_norm`)."""
  x = jnp.asarray(x)
  if ord == 2:
    norm = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), epsilon))
  else:
    norm = jnp.maximum(jnp.sum(jnp.abs(x) ** ord, axis=axis, keepdims=True) ** (1.0 / ord), epsilon)
  return x / norm


def log_norm(x, axis: int = 1, scale_factor: float = 10000.0):
  """log(1 + x / sum(x) * scale) normalization used for count data."""
  x = jnp.asarray(x, jnp.float32)
  s = jnp.sum(x, axis=axis, keepdims=True)
  return jnp.log1p(x / jnp.maximum(s, 1e-8) * scale_factor)


def whitening(x, mean=None, cov=None, epsilon: float = 1e-5):
  """ZCA whitening transform of row vectors.

  Reference: ``odin/backend/maths.py`` (`whitening`).
  """
  x = jnp.asarray(x, jnp.float32)
  if mean is None:
    mean = jnp.mean(x, axis=0, keepdims=True)
  xc = x - mean
  if cov is None:
    cov = (xc.T @ xc) / x.shape[0]
  w, v = jnp.linalg.eigh(cov)
  W = v @ jnp.diag(1.0 / jnp.sqrt(w + epsilon)) @ v.T
  return xc @ W


def logsumexp_mean(x, axis: int = 0):
  """log-mean-exp — the importance-weighted average used by IWAE
  (reference ``odin/bay/vi/_base.py:91-122``)."""
  x = jnp.asarray(x)
  n = x.shape[axis]
  return jax.scipy.special.logsumexp(x, axis=axis) - jnp.log(float(n))


def to_llh(x):
  """Probabilities -> log-likelihoods ``log p(x|class)`` with row
  normalization and clipping (reference ``maths.py:519``)."""
  x = jnp.asarray(x, jnp.float32)
  x = x / jnp.sum(x, axis=-1, keepdims=True)
  return jnp.log(jnp.clip(x, 1e-8, 1.0 - 1e-8))


def to_llr(x):
  """Probabilities/scores -> log-likelihood ratios
  ``log p(x|target) - log p(x|non-target)`` per class, the standard
  verification-score calibration surface (reference ``maths.py:529``; its
  hard-coded ``log(13)`` NIST-SRE class constant is dropped — the LLR is
  shift-normalized by the true non-target count instead)."""
  x = jnp.asarray(x, jnp.float32)
  n = x.shape[-1]
  llr = []
  for j in range(n):
    rest = jnp.concatenate([x[:, :j], x[:, j + 1:]], axis=-1)
    rest = rest - x[:, j:j + 1]
    llr.append(-jax.scipy.special.logsumexp(rest, axis=1))
  return jnp.stack(llr, axis=-1) + jnp.log(float(max(n - 1, 1)))


def to_sample_weights(indices, weights):
  """Class indices (or one-hot rows) + per-class weights -> per-sample
  weights (reference ``maths.py:544``)."""
  indices = jnp.asarray(indices)
  if indices.ndim > 1:
    indices = jnp.argmax(indices, axis=-1)
  return jnp.asarray(weights, jnp.float32)[indices.astype(jnp.int32)]


def renorm_rms(x, axis: int = 1, target_rms: float = 1.0):
  """Scale so the RMS along `axis` is `target_rms` (reference
  ``maths.py:340``)."""
  x = jnp.asarray(x, jnp.float32)
  d = jnp.sqrt(float(x.shape[axis]))
  rms = jnp.sqrt(jnp.sum(x ** 2, axis=axis, keepdims=True)) / d
  rms = jnp.where(rms == 0.0, jnp.ones_like(rms), rms)
  return target_rms * x / rms


def poincare_normalize(x, axis: int = -1, epsilon: float = 1e-6):
  """Project onto the Poincare ball (norm < 1) for hyperbolic embeddings
  (reference ``maths.py:565`` `poincare_normalize`; the capability behind
  the reference's empty ``ml/poincare_embedding.py`` stub)."""
  x = jnp.asarray(x, jnp.float32)
  norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
  max_norm = 1.0 - epsilon
  return jnp.where(norm > max_norm, x / norm * max_norm, x)


__all__ += ["to_llh", "to_llr", "to_sample_weights", "renorm_rms",
            "poincare_normalize"]


def l2_normalize(x, axis=None, eps: float = 1e-12):
  """``x / sqrt(max(sum(x^2), eps))`` (reference ``maths.py:84``,
  tf.nn.l2_normalize semantics)."""
  x = jnp.asarray(x)
  sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
  return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def calc_white_mat(X):
  """Whitening transform W = chol(inv(X)) of a covariance matrix
  (reference ``maths.py:133``; pairs with `whitening` which whitens data
  directly)."""
  return jnp.linalg.cholesky(jnp.linalg.inv(jnp.asarray(X)))


def reduce_logexp(x, reduction_function=jnp.mean, axis=None):
  """Overflow-safe ``log(reduce(exp(x)))`` for any reduction
  (reference ``maths.py:469``)."""
  x = jnp.asarray(x)
  x_max = jnp.max(x, axis=axis, keepdims=True)
  y = jnp.log(reduction_function(jnp.exp(x - x_max), axis=axis,
                                 keepdims=True)) + x_max
  return jnp.squeeze(y)


def apply_mask(x, mask):
  """Mask trailing feature frames: ``x * mask[..., None]``
  (reference ``tensor.py:893``)."""
  return jnp.asarray(x) * jnp.expand_dims(jnp.asarray(mask, jnp.result_type(x)), -1)


def tril_mask(shape):
  """Lower-triangular boolean mask over the last two dims
  (reference ``tensor.py:455``)."""
  ones = jnp.ones(tuple(shape), jnp.int32)
  return jnp.cumsum(ones, axis=-2) >= jnp.cumsum(ones, axis=-1)


__all__ += ["l2_normalize", "calc_white_mat", "reduce_logexp", "apply_mask",
            "tril_mask"]


def softmin(x, axis=None):
  """``exp(-x_i) / sum_j exp(-x_j)`` (reference ``maths.py:204``)."""
  return jax.nn.softmax(-jnp.asarray(x), axis=-1 if axis is None else axis)


def upsample(x, scale, axes, method: str = "nn"):
  """Integer upsampling along `axes` (reference ``maths.py:617``).

  'nn' repeats each element (``[1, 2] -> [1, 1, 2, 2]``), 'repeat' tiles
  the whole axis (``[1, 2] -> [1, 2, 1, 2]``), 'pad_margin' zero-pads
  around the existing content (ceil/floor split as the reference).
  """
  x = jnp.asarray(x)
  axes = [a % x.ndim for a in (axes if isinstance(axes, (list, tuple))
                               else (axes,))]
  scales = list(scale) if isinstance(scale, (list, tuple)) \
      else [int(scale)] * len(axes)
  if method == "nn":
    for a, s in zip(axes, scales):
      x = jnp.repeat(x, s, axis=a)
  elif method == "repeat":
    for a, s in zip(axes, scales):
      x = jnp.tile(x, [s if i == a else 1 for i in range(x.ndim)])
  elif method == "pad_margin":
    smap = dict(zip(axes, scales))
    pads = []
    for i in range(x.ndim):
      if i in smap:
        extra = x.shape[i] * (smap[i] - 1)
        pads.append((int(np.ceil(extra / 2)), int(np.floor(extra / 2))))
      else:
        pads.append((0, 0))
    x = jnp.pad(x, pads)
  else:
    raise ValueError(f"no support for method={method!r}")
  return x


__all__ += ["softmin", "upsample"]
