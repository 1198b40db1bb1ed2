"""Streaming (online) speech feature extraction with carry state.

Production serving of speech models needs the front-end to run on live
audio CHUNKS, not whole utterances (the reference is strictly offline —
its pipeline maps whole files per worker, ``odin/preprocessing/
processor.py:557``).  This module makes the fused device front-end
(`ops.features.speech_features`) stateful and chunk-incremental:

  state = streaming_init(cfg, batch)
  state, out = streaming_step(state, chunk)   # jittable, static shapes
  mspec = streaming_finalize(cfg, state, [out1, out2, ...])

Exactness contract (tested in ``tests/test_ops_features.py``): the
concatenated per-chunk log-mels / MFCCs / energies over the VALID frame
slots equal the offline `speech_features` on the concatenated waveform —
including the per-utterance top-dB clip, which depends on the utterance
max and is therefore applied at `streaming_finalize` from the running
max carried in the state (the raw per-chunk outputs are unclipped).
CMVN and the energy VAD are likewise whole-utterance statistics:
`streaming_finalize` recomputes them from the finalized (clipped)
features — exact by construction, and the latency-critical
`streaming_step` carries no moment accumulators for them.  Deltas need
±width future frames; apply `ops.features._batch_delta` to the finalized
feature matrix (or accept a `delta_width`-frame latency downstream).

Mechanics: the state carries the last ``ceil((L - S)/S) * S`` samples so
every chunk's frame starts stay aligned to the global ``step_length``
grid; each step emits exactly ``chunk_len // S`` frame slots, of which
the leading slots of the first step (negative global start) and any
slots whose frames overrun the consumed stream are masked via the
returned ``frame_mask``.  All shapes are static: one compile serves the
whole stream.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.ops.features import FeatureConfig, dft_bases, frame_signal

__all__ = ["StreamState", "streaming_init", "streaming_step",
           "streaming_finalize", "carry_samples"]

_PREC = jax.lax.Precision.HIGHEST


def carry_samples(config: FeatureConfig) -> int:
  """Carried samples: L - S rounded UP to a step multiple, so frame starts
  stay on the global step grid across chunks."""
  L, S = config.frame_length, config.step_length
  return int(np.ceil((L - S) / S)) * S


class StreamState(NamedTuple):
  carry: jnp.ndarray       # (B, carry_samples) trailing raw samples
  pre_last: jnp.ndarray    # (B, 1) last raw sample (pre-emphasis continuity)
  n_consumed: jnp.ndarray  # () int32 samples consumed so far
  ref_max: jnp.ndarray     # (B, 1, 1) running max of raw log-mel (top-dB)


def streaming_init(config: FeatureConfig, batch: int) -> StreamState:
  Cr = carry_samples(config)
  f32 = jnp.float32
  return StreamState(
      carry=jnp.zeros((batch, Cr), f32),
      pre_last=jnp.zeros((batch, 1), f32),
      n_consumed=jnp.zeros((), jnp.int32),
      ref_max=jnp.full((batch, 1, 1), -1e30, f32))


def streaming_step(config: FeatureConfig, state: StreamState,
                   chunk: jnp.ndarray
                   ) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
  """Consume one (B, C) chunk (C a multiple of step_length; int16 or
  float32) and emit C // step_length frame slots of raw (unclipped,
  un-normalized) features + their validity mask.  Jit once per chunk
  shape."""
  L, S = config.frame_length, config.step_length
  if chunk.ndim == 1:
    chunk = chunk[None]
  if chunk.dtype == jnp.int16:
    chunk = chunk.astype(jnp.float32) * (1.0 / 32768.0)
  B, C = chunk.shape
  if C % S:
    raise ValueError(f"chunk length {C} must be a multiple of step {S}")
  Cr = carry_samples(config)
  if Cr + C < L:
    raise ValueError(f"chunk too short: carry {Cr} + chunk {C} < frame {L}")
  n_out = C // S

  ext = jnp.concatenate([state.carry, chunk], axis=1)  # (B, Cr + C)
  # pre-emphasis over the extended window; position 0's predecessor (the
  # sample just before the carry) is carried explicitly in pre_last
  prev = jnp.concatenate([state.pre_last, ext[:, :-1]], axis=1)
  pe = ext - config.preemphasis * prev
  # the global first sample stays raw (reference pre_emphasis semantics);
  # on the first chunk it sits at ext position Cr (right after the zero
  # carry)
  first_global = jnp.arange(Cr + C)[None, :] == Cr
  pe = jnp.where((state.n_consumed == 0) & first_global, ext, pe)

  starts = np.arange(n_out) * S
  take = starts[-1] + L  # samples needed from ext for the last frame
  if take > Cr + C:
    # the final frame slots read past the chunk: frame them against zeros
    ext_p = jnp.pad(pe, ((0, 0), (0, take - (Cr + C))))
  else:
    ext_p = pe
  frames = frame_signal(ext_p[:, :take], L, S)  # (B, n_out, L)
  win = jnp.asarray(config.window_fn)
  frames_w = frames * win
  energy = jnp.sum(frames_w * frames_w, axis=-1)
  energy = jnp.log(jnp.maximum(energy, np.finfo(np.float32).eps))

  cos_b, sin_b = dft_bases(L, config.n_fft)
  re = jnp.matmul(frames_w, jnp.asarray(cos_b), precision=_PREC)
  im = jnp.matmul(frames_w, jnp.asarray(sin_b), precision=_PREC)
  spec = (re * re + im * im) * (config.scale ** 2)
  mel = jnp.matmul(spec, jnp.asarray(config.mel_basis.T), precision=_PREC)
  mspec_raw = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
  dct_T = jnp.asarray(config.dct_basis.T)
  mfcc_raw = jnp.matmul(mspec_raw, dct_T, precision=_PREC)
  if config.remove_first_coef:
    mfcc_raw = mfcc_raw[..., 1:]

  # validity: global start >= 0 AND the frame is fully inside the stream
  g_start = state.n_consumed - Cr + jnp.asarray(starts)
  mask = (g_start >= 0) & (g_start + L <= state.n_consumed + C)
  mask = jnp.broadcast_to(mask[None, :], (B, n_out))

  m = mask[..., None].astype(jnp.float32)
  neg = jnp.asarray(-1e30, mspec_raw.dtype)
  new_state = StreamState(
      carry=ext[:, -Cr:] if Cr else ext[:, :0],
      pre_last=ext[:, -Cr - 1:-Cr] if Cr else ext[:, -1:],
      n_consumed=state.n_consumed + C,
      ref_max=jnp.maximum(state.ref_max,
                          jnp.max(jnp.where(m > 0, mspec_raw, neg),
                                  axis=(-2, -1), keepdims=True)))
  out = dict(mspec_raw=mspec_raw, mfcc_raw=mfcc_raw, energy=energy[..., None],
             frame_mask=mask, spec=spec)
  return new_state, out


def streaming_finalize(config: FeatureConfig, state: StreamState,
                       outputs: List[Dict[str, jnp.ndarray]]
                       ) -> Dict[str, jnp.ndarray]:
  """Concatenate per-chunk outputs and apply the whole-utterance
  statistics: the top-dB clip from the running max carried in the state,
  then CMVN and the energy VAD recomputed from the finalized (clipped)
  features — exactly the offline semantics.  Returns the offline
  `speech_features` keys restricted to emitted slots."""
  cat = {k: jnp.concatenate([o[k] for o in outputs], axis=1)
         for k in outputs[0]}
  mask = cat.pop("frame_mask")
  mspec = jnp.maximum(cat.pop("mspec_raw"), state.ref_max - config.top_db)
  # the top-dB clip shifts MFCCs wherever it bites, so recompute from the
  # clipped mel (one matmul — cheap at finalize time)
  dct_T = jnp.asarray(config.dct_basis.T)
  mfcc = jnp.matmul(mspec, dct_T, precision=_PREC)
  if config.remove_first_coef:
    mfcc = mfcc[..., 1:]
  # energy-threshold VAD over the whole stream (same rule as the offline
  # `speech_features`)
  energy = cat["energy"][..., 0]
  e_valid = jnp.where(mask, energy, jnp.nan)
  e_mean = jnp.nanmean(e_valid, axis=1, keepdims=True)
  e_std = jnp.sqrt(jnp.nanmean((e_valid - e_mean) ** 2, axis=1,
                               keepdims=True))
  vad = (energy > (e_mean - 0.5 * e_std)) & mask
  out = dict(mspec=mspec, mfcc=mfcc, energy=cat["energy"],
             frame_mask=mask, vad=vad, spec=cat["spec"])
  if config.cmvn:
    # offline CMVN normalizes the CLIPPED features — recompute the moments
    # from the finalized features for exactness
    m = mask[..., None].astype(mspec.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    for key, f in (("mspec", mspec), ("mfcc", mfcc)):
      mu = jnp.sum(f * m, axis=1, keepdims=True) / denom
      var = jnp.sum((f - mu) ** 2 * m, axis=1, keepdims=True) / denom
      out[key + "_cmvn"] = (f - mu) / jnp.maximum(jnp.sqrt(var), 1e-20)
  return out
