"""Audio ingest dtype study: end-to-end mel/VAD frames/s by transfer format.

The extraction metric is transfer-bound (BASELINE.md), so the ingest dtype
sets the ceiling: fp32 (4 bytes/sample), raw int16 PCM (2 — what wav files
hold), or raw G.711 mu-law codewords (1 — what telephony corpora like the
NIST SPHERE sets hold; the reference's speaker-recognition domain).  int16
scaling and mu-law expansion happen ON DEVICE (`ops.features`), both exact
for their source formats.

Measurement discipline (CLAUDE.md): each mode runs FIRST in a fresh
process (`python benchmarks/ingest_bench.py u8|i16|f32`), one distinct
buffer per round (the backend memoizes bit-identical dispatches), and the
tunnel's day-to-day variance demands paired, alternated runs.

Measured 2026-08-19 (alternating fresh processes, 64 x 4 s utterances):
  u8 (mu-law): 8.4M / 9.1M / 9.8M frames/s
  i16:         3.4M / 3.7M / 4.6M frames/s   (~2.2x less than u8)
  f32:         2.2M frames/s (earlier same-day probe)
"""
import sys
import time

import numpy as np


def ulaw_compress(x):
  """Inverse G.711 (host-side, only to synthesize test codewords)."""
  pcm = np.clip(x * 32768.0, -32635, 32635).astype(np.int32)
  sign = (pcm < 0).astype(np.int32)
  mag = np.abs(pcm) + 0x84
  exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int32)
  mant = (mag >> (exp + 3)) & 0x0F
  return (~((sign << 7) | (exp << 4) | mant)).astype(np.uint8)


def main():
  import jax
  import jax.numpy as jnp

  from odin_tpu.ops.features import FeatureConfig, speech_features

  mode = sys.argv[1] if len(sys.argv) > 1 else "u8"
  cfg = FeatureConfig()
  T = int(4.0 * cfg.sr)
  batch, rounds = 64, 10
  frames_total = batch * cfg.n_frames(T)
  rs = np.random.RandomState(0)
  base = [(rs.randn(batch, T) * 0.1).astype("f") for _ in range(rounds)]
  make = dict(
      u8=ulaw_compress,
      i16=lambda x: (x * 32768).clip(-32768, 32767).astype(np.int16),
      f32=lambda x: x)[mode]
  xs = [make(b) for b in base]
  fn = jax.jit(lambda a: {k: v for k, v in speech_features(a, cfg).items()
                          if k in ("mspec", "vad")})
  jax.block_until_ready(fn(jnp.asarray(xs[-1])))
  t0 = time.time()
  for x in xs:
    out = fn(jnp.asarray(x))
  jax.block_until_ready(out)
  print(f"{mode}: {frames_total * rounds / (time.time() - t0):,.0f} frames/s")


if __name__ == "__main__":
  main()
