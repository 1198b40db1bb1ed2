"""Feature-extraction throughput: NumPy reference vs fused XLA vs Pallas.

(Reference keeps similar design-comparison scripts in ``benchmarks/``.)
Run on TPU: `python benchmarks/feature_extraction_bench.py`
"""
import time

import numpy as np


def main(batch: int = 64, seconds: float = 4.0, n_rounds: int = 10):
  import jax
  import jax.numpy as jnp

  from odin_tpu.ops.features import FeatureConfig, speech_features
  from odin_tpu.preprocessing import signal as S

  cfg = FeatureConfig()
  sr = cfg.sr
  T = int(seconds * sr)
  y = (np.random.RandomState(0).randn(batch, T) * 0.1).astype("f")
  frames_total = batch * cfg.n_frames(T)
  results = {}

  # numpy single core (reference path)
  t0 = time.time()
  for b in range(2):
    yy = S.pre_emphasis(y[b], cfg.preemphasis)
    spec = np.abs(S.stft(yy, cfg.frame_length, cfg.step_length, cfg.n_fft,
                         window=cfg.window)) ** 2
    S.mels_spectrogram(spec, sr, cfg.n_mels, fmin=cfg.fmin)
  results["numpy"] = 2 * cfg.n_frames(T) / (time.time() - t0)

  for use_pallas in (False, True):
    name = "pallas" if use_pallas else "xla"
    try:
      fn = jax.jit(lambda a: speech_features(a, cfg,
                                             use_pallas=use_pallas)["mspec"])
      staged = jnp.asarray(y)  # device-resident input: compute-only number
      out = fn(staged)
      out.block_until_ready()
      t0 = time.time()
      for _ in range(n_rounds):
        out = fn(staged)
      out.block_until_ready()
      results[name + "_compute"] = frames_total * n_rounds / (time.time() - t0)
      t0 = time.time()
      for _ in range(n_rounds):  # host->device transfer included
        out = fn(jnp.asarray(y))
      out.block_until_ready()
      results[name + "_e2e"] = frames_total * n_rounds / (time.time() - t0)
    except Exception as e:
      results[name] = f"failed: {e}"
  for k, v in results.items():
    print(f"{k:>8s}: {v:,.0f} frames/sec" if isinstance(v, float) else
          f"{k:>8s}: {v}")
  return results


if __name__ == "__main__":
  main()
