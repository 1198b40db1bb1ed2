"""Pallas TPU kernel: fused window-DFT-power-mel-log over frame tiles.

The hot core of feature extraction — per frame: two (frame_length x n_freq)
matmuls (cos/sin DFT bases), square-add, one (n_freq x n_mels) matmul, log —
fused into ONE kernel so the power spectrum never round-trips to HBM.  Each
grid step processes a (TILE_FRAMES, frame_length) tile held in VMEM; the
three matmuls run back-to-back on the MXU with fp32 accumulation.

Replaces the reference's per-file NumPy rfft + matmul chain
(``odin/preprocessing/signal.py:1442,1650``) with a TPU-resident batch path.
"""
from __future__ import annotations

import functools
import math
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if TYPE_CHECKING:
  from odin_tpu.ops.features import FeatureConfig

__all__ = ["logmel_pallas"]

TILE_FRAMES = 128


def _logmel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *,
                   scale_sq: float):
  f = frames_ref[:]
  re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32)
  im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32)
  power = (re * re + im * im) * scale_sq
  mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
  out_ref[:] = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnums=(1,))
def logmel_pallas(frames_windowed: jnp.ndarray,
                  config: "FeatureConfig") -> jnp.ndarray:
  """(B, n_frames, frame_length) windowed frames -> (B, n_frames, n_mels)
  10·log10 mel power (unclipped — top_db applies outside with the
  per-utterance max)."""
  from odin_tpu.ops.features import dft_bases
  B, n_frames, frame_length = frames_windowed.shape
  n_freqs = config.n_fft // 2 + 1
  n_mels = config.n_mels
  cos_b, sin_b = dft_bases(frame_length, config.n_fft)
  mel_T = config.mel_basis.T.astype(np.float32)  # (n_freqs, n_mels)

  flat = frames_windowed.reshape(-1, frame_length)
  total = flat.shape[0]
  pad = (-total) % TILE_FRAMES
  if pad:
    flat = jnp.pad(flat, ((0, pad), (0, 0)))
  n_tiles = flat.shape[0] // TILE_FRAMES

  kernel = functools.partial(_logmel_kernel, scale_sq=float(config.scale ** 2))
  out = pl.pallas_call(
      kernel,
      grid=(n_tiles,),
      in_specs=[
          pl.BlockSpec((TILE_FRAMES, frame_length), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((frame_length, n_freqs), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((frame_length, n_freqs), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n_freqs, n_mels), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((TILE_FRAMES, n_mels), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((flat.shape[0], n_mels), jnp.float32),
      cost_estimate=pl.CostEstimate(
          flops=2 * flat.shape[0] * frame_length * n_freqs * 2 +
          2 * flat.shape[0] * n_freqs * n_mels,
          bytes_accessed=flat.shape[0] * (frame_length + n_mels) * 4,
          transcendentals=flat.shape[0] * n_mels,
      ),
  )(flat, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_T))
  if pad:
    out = out[:total]
  return out.reshape(B, n_frames, n_mels)
