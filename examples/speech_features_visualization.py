"""Extract the full fused feature set from one utterance and render the
stacked inspection figure (reference:
``examples/features/speech_features_visualization.py``).

The reference extracts spec/mspec/mfcc/energy/VAD with its NumPy pipeline
and plots each in a shared-time-axis panel; here the same features come out
of ONE jitted TPU pipeline (`ops.features.speech_features`) and feed
`visual.plot_multiple_features`.
"""
import numpy as np

CONFIG = dict(sr=16000, duration=2.0)


def make_utterance(sr, duration, rng):
  """Synthetic voiced/unvoiced utterance: harmonic chirp bursts in noise."""
  t = np.arange(int(sr * duration)) / sr
  f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t)
  voiced = sum(0.6 / h * np.sin(2 * np.pi * h * np.cumsum(f0) / sr)
               for h in (1, 2, 3, 4))
  envelope = (np.sin(2 * np.pi * 1.1 * t) > 0.1).astype("float32")
  y = envelope * voiced + 0.02 * rng.randn(len(t))
  return y.astype("float32")


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import matplotlib
  matplotlib.use("Agg")
  import jax.numpy as jnp
  from odin_tpu.ops.features import FeatureConfig, speech_features
  from odin_tpu import visual as V

  rng = np.random.RandomState(8)
  y = make_utterance(cfg["sr"], cfg["duration"], rng)
  fc = FeatureConfig(sr=cfg["sr"])
  feats = speech_features(jnp.asarray(y)[None], fc)
  feats = {k: np.asarray(v)[0] for k, v in feats.items()}
  print({k: v.shape for k, v in feats.items()})

  fig = V.plot_multiple_features(
      {"spec": feats["spec"], "mspec": feats["mspec"],
       "mfcc": feats["mfcc"], "energy": feats["energy"],
       "vad": feats["vad"].astype("float32")},
      title="fused TPU speech features", sr=fc.sr, hop=fc.step_length)
  path = V.plot_save("/tmp/speech_features_visualization.pdf")
  print("figure:", path or "/tmp/speech_features_visualization.pdf")


if __name__ == "__main__":
  main()
