"""Device-side spectrogram inversion: batched iSTFT + Griffin-Lim.

The host kernels (`preprocessing.signal.istft/griffin_lim/ispec`,
reference ``signal.py:1565,1838``) invert one utterance at a time in
NumPy — fine for plots, far too slow for batch synthesis.  This module
runs the same math as ONE jitted program per batch:

  * the inverse rFFT is a real matmul against weighted cos/sin bases
    (MXU work, mirroring the forward matmul-DFT in `ops.features`);
  * overlap-add is a single XLA scatter-add over precomputed static
    frame indices, normalized by the precomputed window-square envelope;
  * Griffin-Lim iterates (iSTFT -> STFT -> keep angles) inside one
    `lax.scan`, so 30+ iterations compile to one fused loop.

Numerics match the host kernels: `istft_device` equals
`preprocessing.signal.istft` on the same complex input to fp32
tolerance, and the forward/backward pair satisfies COLA round-trip
(tests/test_ops_features.py).  Phase init uses `jax.random` (the host
uses NumPy's RandomState), so Griffin-Lim is checked by spectral
convergence, not bit equality.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from odin_tpu.preprocessing import signal as np_signal

__all__ = ["stft_device", "istft_device", "griffin_lim_device"]

_PREC = lax.Precision.HIGHEST


def _fwd_bases(frame_length: int, n_fft: int):
  """rFFT cos/sin bases so re = x@cos, im = x@(-sin) (Re/Im of rfft)."""
  t = np.arange(frame_length)[:, None]
  k = np.arange(n_fft // 2 + 1)[None, :]
  ang = 2.0 * np.pi * t * k / n_fft
  return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _inv_bases(frame_length: int, n_fft: int):
  """Weighted bases so x[:frame_length] = re@C + im@S == irfft(re + i*im).

  irfft: x[t] = (1/n) sum_k w_k (Re_k cos(2pi kt/n) - Im_k sin(2pi kt/n)),
  w_k = 1 at k in {0, n/2}, else 2.
  """
  K = n_fft // 2 + 1
  k = np.arange(K)[:, None]
  t = np.arange(frame_length)[None, :]
  w = np.full((K, 1), 2.0)
  w[0] = 1.0
  if n_fft % 2 == 0:
    w[-1] = 1.0
  ang = 2.0 * np.pi * k * t / n_fft
  C = (w * np.cos(ang) / n_fft).astype(np.float32)
  S = (-w * np.sin(ang) / n_fft).astype(np.float32)
  return C, S


def _params(frame_length: int, step_length: Optional[int],
            n_fft: Optional[int], window: str):
  step = int(step_length) if step_length else frame_length // 4
  nf = int(n_fft) if n_fft else int(2 ** np.ceil(np.log2(frame_length)))
  w = np_signal.get_window(window, frame_length, periodic=True) \
      .astype(np.float32)
  scale = float(1.0 / w.sum())  # == sqrt(1 / sum(w)^2), host convention
  return step, nf, w, scale


def stft_device(y: jnp.ndarray, frame_length: int,
                step_length: Optional[int] = None,
                n_fft: Optional[int] = None, window: str = "hann"
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """(B, T) -> (re, im) each (B, n_frames, n_fft//2+1), host-`stft`
  conventions (frames at t*step, window, sqrt(1/sum(w)^2) scaling)."""
  step, nf, w, scale = _params(frame_length, step_length, n_fft, window)
  if y.ndim == 1:
    y = y[None]
  n_frames = 1 + (y.shape[-1] - frame_length) // step
  idx = (np.arange(n_frames) * step)[:, None] + np.arange(frame_length)
  frames = y[..., idx] * jnp.asarray(w)
  cos_b, msin_b = _fwd_bases(frame_length, nf)
  re = jnp.matmul(frames, jnp.asarray(cos_b), precision=_PREC) * scale
  im = jnp.matmul(frames, jnp.asarray(msin_b), precision=_PREC) * scale
  return re, im


def istft_device(re: jnp.ndarray, im: jnp.ndarray, frame_length: int,
                 step_length: Optional[int] = None,
                 window: str = "hann") -> jnp.ndarray:
  """Batched inverse STFT by scatter overlap-add (host `istft` semantics;
  reference ``signal.py:1565``).  (B, F, K) re/im -> (B, T) waveforms."""
  K = re.shape[-1]
  nf = 2 * (K - 1)
  step, _, w, scale = _params(frame_length, step_length, nf, window)
  if re.ndim == 2:
    re, im = re[None], im[None]
  B, F, _ = re.shape
  C, S = _inv_bases(frame_length, nf)
  frames = (jnp.matmul(re / scale, jnp.asarray(C), precision=_PREC)
            + jnp.matmul(im / scale, jnp.asarray(S), precision=_PREC))
  frames = frames * jnp.asarray(w)  # windowed overlap-add
  n = frame_length + step * (F - 1)
  idx = (np.arange(F) * step)[:, None] + np.arange(frame_length)  # (F, L)
  y = jnp.zeros((B, n), frames.dtype).at[:, idx.ravel()].add(
      frames.reshape(B, -1))
  norm = np.zeros(n, np.float32)
  np.add.at(norm, idx.ravel(), np.tile(w ** 2, F))
  return y / jnp.asarray(np.maximum(norm, 1e-8))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def griffin_lim_device(spec_mag: jnp.ndarray, frame_length: int,
                       step_length: Optional[int] = None,
                       n_iter: int = 30, window: str = "hann",
                       key: Optional[jax.Array] = None) -> jnp.ndarray:
  """Batched Griffin-Lim (host `griffin_lim`, reference ``signal.py:1838``)
  as one compiled `lax.scan`: (B, F, K) magnitudes -> (B, T) waveforms."""
  if spec_mag.ndim == 2:
    spec_mag = spec_mag[None]
  if key is None:
    key = jax.random.PRNGKey(1)
  step = int(step_length) if step_length else frame_length // 4
  ang0 = jax.random.uniform(key, spec_mag.shape) * 2 * jnp.pi
  phase = (jnp.cos(ang0), jnp.sin(ang0))

  def body(ph, _):
    cre, cim = ph
    y = istft_device(spec_mag * cre, spec_mag * cim, frame_length, step,
                     window)
    re, im = stft_device(y, frame_length, step,
                         n_fft=2 * (spec_mag.shape[-1] - 1), window=window)
    re, im = re[:, :spec_mag.shape[1]], im[:, :spec_mag.shape[1]]
    mag = jnp.maximum(jnp.sqrt(re * re + im * im), 1e-12)
    return (re / mag, im / mag), None

  (cre, cim), _ = lax.scan(body, phase, None, length=int(n_iter))
  return istft_device(spec_mag * cre, spec_mag * cim, frame_length, step,
                      window)
