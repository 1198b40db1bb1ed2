"""Fused, batched audio feature extraction for TPU (XLA path).

The reference extracts features per file on CPU (NumPy rfft + matmuls inside
multiprocess workers — ``odin/preprocessing/processor.py:557-740``).  The
TPU-native pipeline processes PADDED BATCHES of utterances in one jit:

  pre-emphasis -> framing -> window -> DFT -> |.|^2 -> mel matmul -> log
  -> DCT (MFCC) -> deltas -> CMVN -> energy-VAD

Design choices for the hardware:
  * the DFT is two real matmuls against cos/sin bases (frame_length x
    n_freqs) — MXU work instead of an FFT butterfly, ideal for speech-sized
    frames (n_fft 512);
  * all of the stages are elementwise or matmul, so XLA fuses them into a
    handful of kernels; a hand-written Pallas version of the hot core lives
    in ``odin_tpu.ops.pallas_features``;
  * matmuls run at ``Precision.HIGHEST`` so results match the float32 NumPy
    reference closely (BASELINE.md fidelity target).

All functions are shape-static and mask-aware (padded frames excluded from
CMVN/VAD statistics).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.preprocessing import signal as np_signal

__all__ = ["FeatureConfig", "dft_bases", "frame_signal", "speech_features",
           "ulaw_expand_device",
           "TFCompatConfig", "tf_mel_matrix", "tf_signal_features"]

_PREC = jax.lax.Precision.HIGHEST


class FeatureConfig:
  """Static configuration of the fused feature pipeline."""

  def __init__(self,
               sr: int = 16000,
               frame_length: int = 400,
               step_length: int = 160,
               n_fft: int = 512,
               window: str = "hann",
               n_mels: int = 40,
               n_ceps: int = 20,
               fmin: float = 64.0,
               fmax: Optional[float] = None,
               top_db: float = 80.0,
               preemphasis: float = 0.97,
               remove_first_coef: bool = True,
               delta_width: int = 9,
               cmvn: bool = True):
    self.sr = int(sr)
    self.frame_length = int(frame_length)
    self.step_length = int(step_length)
    self.n_fft = int(n_fft)
    self.window = window
    self.n_mels = int(n_mels)
    self.n_ceps = int(n_ceps)
    self.fmin = float(fmin)
    self.fmax = float(fmax) if fmax is not None else float(sr) / 2
    self.top_db = float(top_db)
    self.preemphasis = float(preemphasis)
    self.remove_first_coef = bool(remove_first_coef)
    self.delta_width = int(delta_width)
    self.cmvn = bool(cmvn)

  @functools.cached_property
  def window_fn(self) -> np.ndarray:
    return np_signal.get_window(self.window, self.frame_length,
                                periodic=True).astype(np.float32)

  @functools.cached_property
  def scale(self) -> float:
    return float(np.sqrt(1.0 / self.window_fn.sum() ** 2))

  @functools.cached_property
  def mel_basis(self) -> np.ndarray:
    return np_signal.mel_filters(self.sr, self.n_fft, self.n_mels,
                                 self.fmin, self.fmax).astype(np.float32)

  @functools.cached_property
  def dct_basis(self) -> np.ndarray:
    n = self.n_ceps + 1 if self.remove_first_coef else self.n_ceps
    return np_signal.dct_filters(n, self.n_mels).astype(np.float32)

  def n_frames(self, n_samples: int) -> int:
    return 1 + (n_samples - self.frame_length) // self.step_length


def dft_bases(frame_length: int, n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
  """Real-DFT cos/sin bases [frame_length, n_fft//2+1] so that
  rfft(x, n_fft) == x@cos - i * x@sin for x of length frame_length."""
  n_freqs = n_fft // 2 + 1
  t = np.arange(frame_length)[:, None]
  k = np.arange(n_freqs)[None, :]
  angle = 2.0 * np.pi * t * k / n_fft
  return (np.cos(angle).astype(np.float32),
          -np.sin(angle).astype(np.float32))


def frame_signal(y: jnp.ndarray, frame_length: int,
                 step_length: int) -> jnp.ndarray:
  """(B, T) -> (B, n_frames, frame_length) via a static gather."""
  n_frames = 1 + (y.shape[-1] - frame_length) // step_length
  starts = np.arange(n_frames) * step_length
  idx = starts[:, None] + np.arange(frame_length)[None, :]
  return y[..., idx]


def _preemphasis(y: jnp.ndarray, coeff: float) -> jnp.ndarray:
  first = y[..., :1]
  rest = y[..., 1:] - coeff * y[..., :-1]
  return jnp.concatenate([first, rest], axis=-1)


def _delta_filter(width: int) -> np.ndarray:
  half = 1 + width // 2
  w = np.arange(half - 1.0, -half, -1.0)
  return (w / np.sum(np.abs(w) ** 2)).astype(np.float32)


def _batch_delta(x: jnp.ndarray, width: int) -> jnp.ndarray:
  """librosa-delta over the time axis of (B, T, F), matching
  np_signal.delta: lfilter(w, 1, edge_padded)[−half−T : −half].

  ``lfilter(w, 1, x)[t] = Σ_k w[k] x[t−k] = convolve(x, w)[t]``, so the
  causal FIR is the first len(x) entries of the full convolution, and the
  reference trim lands at offset ``2·width − half``.
  """
  w = jnp.asarray(_delta_filter(width))
  half = 1 + width // 2
  xp = jnp.pad(x, ((0, 0), (width, width), (0, 0)), mode="edge")
  conv = jax.vmap(  # over batch
      jax.vmap(lambda sig: jnp.convolve(sig, w, mode="full"),
               in_axes=1, out_axes=1))(xp)
  start = 2 * width - half
  return jax.lax.dynamic_slice_in_dim(conv, start, x.shape[1], axis=1)


def ulaw_expand_device(u: jnp.ndarray) -> jnp.ndarray:
  """ITU-T G.711 mu-law expansion on device (uint8 codewords -> float32 in
  [-1, 1)); bit-exact vs the host `preprocessing.speech._ulaw_expand`.
  Telephony corpora (NIST SPHERE mu-law — the reference's speaker-
  recognition domain, ``odin/preprocessing/speech.py:345``) hold 1-byte
  codes: ingesting them raw moves 4x fewer bytes than fp32 over the
  host->device link and is EXACT for those files."""
  u = jnp.invert(u.astype(jnp.uint8)).astype(jnp.int32)
  sign = u & 0x80
  exponent = (u >> 4) & 0x07
  mantissa = u & 0x0F
  magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
  pcm = jnp.where(sign != 0, -magnitude, magnitude)
  return pcm.astype(jnp.float32) * (1.0 / 32768.0)


def speech_features(y: jnp.ndarray,
                    config: FeatureConfig,
                    lengths: Optional[jnp.ndarray] = None,
                    use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
  """Fused pipeline on a padded batch.

  Args:
    y: (B, T) audio, zero-padded to common length T.  float32 in [-1, 1];
      int16 raw PCM (scaled on device, half the transfer bytes); or uint8
      G.711 mu-law codewords (expanded on device — exact for telephony
      corpora, a quarter of the fp32 transfer).
    lengths: (B,) valid sample counts (defaults to full length).
    use_pallas: route the window+DFT+mel core through the Pallas kernel.

  Returns dict with 'spec' (power), 'mspec' (log-mel dB), 'mfcc',
  'energy' (log), 'frame_mask', 'vad' (energy-threshold based).
  """
  if y.ndim == 1:
    y = y[None]
  if y.dtype == jnp.int16:
    # int16 PCM ingested raw: the host->device transfer (the end-to-end
    # bottleneck, BASELINE.md) moves half the bytes; scaling to [-1, 1)
    # happens on device and is exact for wav-sourced audio
    y = y.astype(jnp.float32) * (1.0 / 32768.0)
  elif y.dtype == jnp.uint8:
    y = ulaw_expand_device(y)
  B, T = y.shape
  n_frames = config.n_frames(T)
  if lengths is None:
    lengths = jnp.full((B,), T, jnp.int32)
  # valid frames: frame fully inside the utterance
  frame_ends = jnp.asarray(np.arange(n_frames) * config.step_length +
                           config.frame_length)
  mask = frame_ends[None, :] <= lengths[:, None]  # (B, n_frames)

  y = _preemphasis(y.astype(jnp.float32), config.preemphasis)
  frames = frame_signal(y, config.frame_length, config.step_length)
  win = jnp.asarray(config.window_fn)
  frames_w = frames * win
  # log energy of windowed frames (reference get_energy)
  energy = jnp.sum(frames_w * frames_w, axis=-1)
  energy = jnp.log(jnp.maximum(energy, np.finfo(np.float32).eps))

  if use_pallas:
    from odin_tpu.ops.pallas_features import logmel_pallas
    mspec_raw = logmel_pallas(frames_w, config)  # 10log10 mel power, unclipped
    cos_b, sin_b = dft_bases(config.frame_length, config.n_fft)
    spec = None
  else:
    cos_b, sin_b = dft_bases(config.frame_length, config.n_fft)
    re = jnp.matmul(frames_w, jnp.asarray(cos_b), precision=_PREC)
    im = jnp.matmul(frames_w, jnp.asarray(sin_b), precision=_PREC)
    spec = (re * re + im * im) * (config.scale ** 2)  # power spectrum
    mel = jnp.matmul(spec, jnp.asarray(config.mel_basis.T), precision=_PREC)
    mspec_raw = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

  # top_db clipping with the per-utterance max over VALID frames
  neg = jnp.asarray(-1e30, mspec_raw.dtype)
  masked = jnp.where(mask[..., None], mspec_raw, neg)
  ref_max = jnp.max(masked, axis=(-2, -1), keepdims=True)
  mspec = jnp.maximum(mspec_raw, ref_max - config.top_db)

  # MFCC
  dct_T = jnp.asarray(config.dct_basis.T)
  mfcc = jnp.matmul(mspec, dct_T, precision=_PREC)
  if config.remove_first_coef:
    mfcc = mfcc[..., 1:]

  # energy-threshold VAD (vectorized stand-in for the GMM VAD inside jit;
  # the exact sklearn-GMM VAD stays available host-side via
  # preprocessing.signal.vad_energy)
  e_valid = jnp.where(mask, energy, jnp.nan)
  e_mean = jnp.nanmean(e_valid, axis=1, keepdims=True)
  e_std = jnp.sqrt(jnp.nanmean((e_valid - e_mean) ** 2, axis=1,
                               keepdims=True))
  vad = (energy > (e_mean - 0.5 * e_std)) & mask

  out = dict(mspec=mspec, mfcc=mfcc, energy=energy[..., None],
             frame_mask=mask, vad=vad)
  if spec is not None:
    out["spec"] = spec
  if config.cmvn:
    # masked CMVN over time
    m = mask[..., None].astype(mspec.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    for key in ("mspec", "mfcc"):
      f = out[key]
      mu = jnp.sum(f * m, axis=1, keepdims=True) / denom
      var = jnp.sum((f - mu) ** 2 * m, axis=1, keepdims=True) / denom
      out[key + "_cmvn"] = (f - mu) / jnp.maximum(jnp.sqrt(var), 1e-20)
  if config.delta_width:
    out["mfcc_delta"] = _batch_delta(out["mfcc"], config.delta_width)
  return out


# ---------------------------------------------------------------------------
# tf.signal-compatible path (reference ``odin/fuel/audio_data.py:17-80``)
# ---------------------------------------------------------------------------
class TFCompatConfig:
  """Configuration matching the reference `AudioFeatureLoader`'s tf.signal
  semantics (``odin/fuel/audio_data.py:54-104``): periodic Hann window, NO
  pre-emphasis/centering, fft_length = next pow2 of frame_length, HTK mel
  scale via `tf.signal.linear_to_mel_weight_matrix`, dB conversion with a
  per-utterance top_dB floor, MFCC via
  `tf.signal.mfccs_from_log_mel_spectrograms` (orthogonally-scaled DCT-II).

  This is a DISTINCT numeric path from `FeatureConfig` (which matches the
  reference's NumPy ``signal.py`` kernels: Slaney mel, pre-emphasis,
  windowed-energy): users migrating models trained on the reference's
  tf.data audio pipeline get bit-compatible features here
  (held to fp32 tolerance by ``tests/test_tf_signal_parity.py``).
  """

  def __init__(self,
               frame_length: int = 256,
               frame_step: int = 80,
               fft_length: Optional[int] = None,
               sample_rate: int = 8000,
               power: float = 2.0,
               top_DB: Optional[float] = 80.0,
               num_mel_bins: int = 20,
               num_cepstral: Optional[int] = None,
               log_mels: bool = False,
               lower_edge_hertz: float = 125.0,
               upper_edge_hertz: float = 3800.0):
    self.frame_length = int(frame_length)
    self.frame_step = int(frame_step)
    if fft_length is None:
      fft_length = frame_length
    # reference: smallest power of 2 enclosing frame_length (:77-78)
    self.fft_length = 2 ** int(np.ceil(np.log2(fft_length)))
    self.sample_rate = int(sample_rate)
    self.power = float(power)
    self.top_DB = None if top_DB is None else float(top_DB)
    self.num_mel_bins = int(num_mel_bins)
    self.num_cepstral = num_cepstral
    self.log_mels = bool(log_mels)
    self.lower_edge_hertz = float(lower_edge_hertz)
    self.upper_edge_hertz = float(upper_edge_hertz)

  @functools.cached_property
  def window_fn(self) -> np.ndarray:
    # tf.signal.hann_window: periodic by default
    n = self.frame_length
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)) \
        .astype(np.float32)

  @functools.cached_property
  def mel_weight(self) -> np.ndarray:
    return tf_mel_matrix(self.num_mel_bins, self.fft_length // 2 + 1,
                         self.sample_rate, self.lower_edge_hertz,
                         self.upper_edge_hertz)

  @functools.cached_property
  def mfcc_basis(self) -> np.ndarray:
    """`mfccs_from_log_mel_spectrograms` == unnormalized DCT-II scaled by
    1/sqrt(2*num_mel_bins), as one matmul basis [num_mel_bins, n_out]."""
    N = self.num_mel_bins
    n = np.arange(N)[:, None]
    k = np.arange(N)[None, :]
    basis = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * N))
    return (basis / np.sqrt(2.0 * N)).astype(np.float32)

  def n_frames(self, n_samples: int) -> int:
    # tf.signal.stft pad_end=False
    return 1 + (n_samples - self.frame_length) // self.frame_step


def _hertz_to_mel_htk(f):
  return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def tf_mel_matrix(num_mel_bins: int, num_spectrogram_bins: int,
                  sample_rate: float, lower_edge_hertz: float,
                  upper_edge_hertz: float) -> np.ndarray:
  """NumPy mirror of `tf.signal.linear_to_mel_weight_matrix` (HTK mel scale,
  first `bands_to_zero=1` spectrogram bin zeroed); shape
  [num_spectrogram_bins, num_mel_bins]."""
  bands_to_zero = 1
  nyquist = sample_rate / 2.0
  linear_freqs = np.linspace(0.0, nyquist,
                             num_spectrogram_bins)[bands_to_zero:]
  spec_mel = _hertz_to_mel_htk(linear_freqs)[:, None]
  edges = np.linspace(_hertz_to_mel_htk(lower_edge_hertz),
                      _hertz_to_mel_htk(upper_edge_hertz),
                      num_mel_bins + 2)
  lower, center, upper = edges[:-2][None, :], edges[1:-1][None, :], \
      edges[2:][None, :]
  lower_slopes = (spec_mel - lower) / (center - lower)
  upper_slopes = (upper - spec_mel) / (upper - center)
  w = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))
  return np.pad(w, [[bands_to_zero, 0], [0, 0]]).astype(np.float32)


def tf_signal_features(y: jnp.ndarray, config: TFCompatConfig,
                       lengths: Optional[jnp.ndarray] = None
                       ) -> Dict[str, jnp.ndarray]:
  """Batched JAX re-implementation of the reference loader's per-utterance
  map (`stft`/`magnitude`/`melspec`/`mfccs`/`amplitude_to_DB`,
  ``odin/fuel/audio_data.py:210-269``); same MXU-matmul DFT design as
  `speech_features`.

  Returns dict with 'stft_re'/'stft_im', 'spec' (dB magnitude^power),
  'mels' (dB or log mel), 'mfcc', 'frame_mask'.  The per-utterance top_DB
  floor uses only VALID frames when `lengths` is given (the reference
  operates on single unpadded utterances)."""
  if y.ndim == 1:
    y = y[None]
  y = y.astype(jnp.float32)
  B, T = y.shape
  n_frames = config.n_frames(T)
  if lengths is None:
    lengths = jnp.full((B,), T, jnp.int32)
  frame_ends = jnp.asarray(np.arange(n_frames) * config.frame_step +
                           config.frame_length)
  mask = frame_ends[None, :] <= lengths[:, None]

  frames = frame_signal(y, config.frame_length, config.frame_step)
  frames = frames * jnp.asarray(config.window_fn)
  cos_b, sin_b = dft_bases(config.frame_length, config.fft_length)
  re = jnp.matmul(frames, jnp.asarray(cos_b), precision=_PREC)
  im = jnp.matmul(frames, jnp.asarray(sin_b), precision=_PREC)
  mag = jnp.sqrt(re * re + im * im)
  if config.power > 1.0:
    mag = mag ** config.power

  def amplitude_to_db(s):
    # reference amplitude_to_DB (:260-269): per-utterance max floor
    multiplier = 10.0 if config.power == 2.0 else 20.0
    s_db = multiplier * (jnp.log(jnp.maximum(s, 1e-10)) / np.log(10.0))
    if config.top_DB is not None:
      neg = jnp.asarray(-1e30, s_db.dtype)
      masked = jnp.where(mask[..., None], s_db, neg)
      ref = jnp.max(masked, axis=(-2, -1), keepdims=True)
      s_db = jnp.maximum(s_db, ref - config.top_DB)
    return s_db

  mel = jnp.matmul(mag, jnp.asarray(config.mel_weight), precision=_PREC)
  if config.log_mels:
    mels = jnp.log(mel + 1e-6)
  else:
    mels = amplitude_to_db(mel)
  mfcc = jnp.matmul(mels, jnp.asarray(config.mfcc_basis), precision=_PREC)
  if config.num_cepstral is not None:
    mfcc = mfcc[..., :int(config.num_cepstral)]
  return dict(stft_re=re, stft_im=im, spec=amplitude_to_db(mag), mels=mels,
              mfcc=mfcc, frame_mask=mask)
