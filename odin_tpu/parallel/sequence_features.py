"""Sequence-parallel speech feature extraction: the TIME axis sharded
across the mesh with halo exchange.

SURVEY.md §5 names this as the honest TPU-native sequence-parallel design
for the speech front-end (the reference has no counterpart — it processes
whole files per CPU worker, ``odin/preprocessing/processor.py:557-740``):
each chip windows + DFTs its slice of the waveform; the only communication
is a `ppermute` halo of ``frame_length - step_length`` samples at shard
edges (overlapping frames), one sample for pre-emphasis continuity, and
``psum``/``pmax`` for the per-utterance statistics (top-dB reference max,
CMVN moments, VAD energy stats).  Deltas exchange a ``delta_width``-frame
halo of MFCCs.

Use this when single utterances are too long for one chip's HBM or when
feature extraction should ride the whole mesh for one stream (hour-scale
recordings); for corpora of normal utterances, sharding BY UTTERANCE
(`__graft_entry__` dryrun phase 3) is the zero-collective fast path.

Contract: ``T % (n_shards * step_length) == 0`` and
``frame_length - step_length <= T // n_shards`` (the halo fits in one
neighbor).  The output time axis has ``T // step_length`` frame slots —
slightly MORE than the unsharded ``1 + (T - frame_length) // step_length``
because trailing slots whose frames overrun T are kept for shape
uniformity; they are masked out of every statistic (``frame_mask``) and
`n_valid_frames` gives the unsharded count.  On the valid slots every
output equals the unsharded `speech_features` (equality-tested on the
8-device CPU mesh in ``tests/test_parallel.py``); deltas additionally
match exactly for frames at least ``delta_width`` slots before the global
tail (the unsharded path edge-replicates where the sharded path sees the
masked tail slots).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
  from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map  # type: ignore

from odin_tpu.ops.features import (FeatureConfig, _delta_filter, dft_bases,
                                   frame_signal)

__all__ = ["speech_features_time_sharded", "n_valid_frames"]


def n_valid_frames(config: FeatureConfig, n_samples: int) -> int:
  """The unsharded frame count: slots beyond this index are masked."""
  return config.n_frames(n_samples)


def _shift_from_right(x, axis_name, n, fill):
  """Each shard receives its RIGHT neighbor's `x`; the last shard gets
  `fill` (no wraparound semantics)."""
  k = lax.axis_index(axis_name)
  recv = lax.ppermute(x, axis_name, [(i, (i - 1) % n) for i in range(n)])
  return jnp.where(k == n - 1, fill, recv)


def _shift_from_left(x, axis_name, n, fill):
  """Each shard receives its LEFT neighbor's `x`; shard 0 gets `fill`."""
  k = lax.axis_index(axis_name)
  recv = lax.ppermute(x, axis_name, [(i, (i + 1) % n) for i in range(n)])
  return jnp.where(k == 0, fill, recv)


def speech_features_time_sharded(
    y: jnp.ndarray,
    config: FeatureConfig,
    mesh: Mesh,
    axis: str = "data",
    lengths: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
  """`ops.features.speech_features` with the SAMPLE axis sharded over
  `mesh[axis]` (see module docstring for the exact equality contract).

  Args:
    y: (B, T) float32/int16 audio, T divisible by
      ``mesh.shape[axis] * config.step_length``.
    lengths: (B,) valid sample counts (default: T).

  Returns the `speech_features` dict with time axes of ``T // step``
  slots, each output sharded along `axis` on its frame dimension.
  """
  n = int(mesh.shape[axis])
  L, S = config.frame_length, config.step_length
  if y.ndim == 1:
    y = y[None]
  if y.dtype == jnp.int16:
    y = y.astype(jnp.float32) * (1.0 / 32768.0)
  B, T = y.shape
  if T % (n * S):
    raise ValueError(f"T={T} must be divisible by n_shards*step={n * S}")
  C = T // n
  H = L - S  # right-halo samples (overlap of frames straddling the edge)
  if H > C:
    raise ValueError(f"halo {H} exceeds shard span {C}: use fewer shards")
  Floc = C // S
  if config.delta_width and config.delta_width > Floc:
    raise ValueError(
        f"delta_width={config.delta_width} exceeds the {Floc} frames per "
        f"shard — the MFCC delta halo must fit in one neighbor; use fewer "
        f"shards, longer audio, or FeatureConfig(delta_width=0)")
  if lengths is None:
    lengths = jnp.full((B,), T, jnp.int32)
  w = int(config.delta_width)
  win = jnp.asarray(config.window_fn)
  cos_b, sin_b = dft_bases(L, config.n_fft)
  mel_T = jnp.asarray(config.mel_basis.T)
  dct_T = jnp.asarray(config.dct_basis.T)
  eps = np.finfo(np.float32).eps

  def _local(y_loc, lens):
    k = lax.axis_index(axis)
    # ---- halo exchange: 1 sample left (pre-emphasis), L-S right (frames)
    left1 = _shift_from_left(y_loc[:, -1:], axis, n,
                             jnp.zeros_like(y_loc[:, -1:]))
    right = _shift_from_right(y_loc[:, :H], axis, n,
                              jnp.zeros_like(y_loc[:, :H]))
    y_ext = jnp.concatenate([left1, y_loc, right], axis=1)  # (B, 1+C+H)
    pe = y_ext[:, 1:] - config.preemphasis * y_ext[:, :-1]  # (B, C+H)
    # global first sample is kept raw (reference pre_emphasis semantics)
    pe = jnp.where((k == 0) & (jnp.arange(C + H)[None, :] == 0),
                   y_ext[:, 1:], pe)

    frames = frame_signal(pe, L, S)  # (B, Floc, L): starts at 0, S, ...
    frames_w = frames * win
    energy = jnp.sum(frames_w * frames_w, axis=-1)
    energy = jnp.log(jnp.maximum(energy, eps))

    re = jnp.matmul(frames_w, jnp.asarray(cos_b),
                    precision=lax.Precision.HIGHEST)
    im = jnp.matmul(frames_w, jnp.asarray(sin_b),
                    precision=lax.Precision.HIGHEST)
    spec = (re * re + im * im) * (config.scale ** 2)
    mel = jnp.matmul(spec, mel_T, precision=lax.Precision.HIGHEST)
    mspec_raw = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

    # ---- global frame mask + per-utterance top-dB max (pmax)
    g_idx = k * Floc + jnp.arange(Floc)
    mask = (g_idx * S + L)[None, :] <= lens[:, None]  # (B, Floc)
    neg = jnp.asarray(-1e30, mspec_raw.dtype)
    local_max = jnp.max(jnp.where(mask[..., None], mspec_raw, neg),
                        axis=(-2, -1), keepdims=True)
    ref_max = lax.pmax(local_max, axis)
    mspec = jnp.maximum(mspec_raw, ref_max - config.top_db)

    mfcc = jnp.matmul(mspec, dct_T, precision=lax.Precision.HIGHEST)
    if config.remove_first_coef:
      mfcc = mfcc[..., 1:]

    # ---- global VAD energy stats (psum)
    m = mask.astype(mspec.dtype)
    cnt = jnp.maximum(lax.psum(jnp.sum(m, axis=1), axis), 1.0)  # (B,)
    e_sum = lax.psum(jnp.sum(energy * m, axis=1), axis)
    e_mean = e_sum / cnt
    e_var = lax.psum(jnp.sum((energy - e_mean[:, None]) ** 2 * m, axis=1),
                     axis) / cnt
    vad = (energy > (e_mean - 0.5 * jnp.sqrt(e_var))[:, None]) & mask

    out = dict(mspec=mspec, mfcc=mfcc, energy=energy[..., None],
               frame_mask=mask, vad=vad, spec=spec)
    if config.cmvn:
      m3 = mask[..., None].astype(mspec.dtype)
      denom = jnp.maximum(lax.psum(jnp.sum(m3, axis=1, keepdims=True),
                                   axis), 1.0)
      for key in ("mspec", "mfcc"):
        f = out[key]
        mu = lax.psum(jnp.sum(f * m3, axis=1, keepdims=True), axis) / denom
        var = lax.psum(jnp.sum((f - mu) ** 2 * m3, axis=1, keepdims=True),
                       axis) / denom
        out[key + "_cmvn"] = (f - mu) / jnp.maximum(jnp.sqrt(var), 1e-20)

    if w:
      # ---- delta: w-frame MFCC halo each side; global edges replicate
      # (matching _batch_delta's edge padding)
      edge_l = jnp.repeat(mfcc[:, :1], w, axis=1)
      edge_r = jnp.repeat(mfcc[:, -1:], w, axis=1)
      left_f = _shift_from_left(mfcc[:, -w:], axis, n, edge_l)
      right_f = _shift_from_right(mfcc[:, :w], axis, n, edge_r)
      x_ext = jnp.concatenate([left_f, mfcc, right_f], axis=1)
      filt = jnp.asarray(_delta_filter(w))
      half = 1 + w // 2
      conv = jax.vmap(jax.vmap(
          lambda sig: jnp.convolve(sig, filt, mode="full"),
          in_axes=1, out_axes=1))(x_ext)
      out["mfcc_delta"] = lax.dynamic_slice_in_dim(
          conv, 2 * w - half, Floc, axis=1)
    return out

  fdim = dict(mspec=P(None, axis, None), mfcc=P(None, axis, None),
              energy=P(None, axis, None), frame_mask=P(None, axis),
              vad=P(None, axis), spec=P(None, axis, None))
  if config.cmvn:
    fdim["mspec_cmvn"] = P(None, axis, None)
    fdim["mfcc_cmvn"] = P(None, axis, None)
  if w:
    fdim["mfcc_delta"] = P(None, axis, None)
  fn = shard_map(_local, mesh=mesh, in_specs=(P(None, axis), P()),
                 out_specs=fdim, check_vma=False)
  return fn(y.astype(jnp.float32) if y.dtype != jnp.float32 else y, lengths)
