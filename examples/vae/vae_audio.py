"""VAE on speech features (reference: ``examples/vae/vae_audio.py``):
fused on-device mel extraction (ops.features) feeding a dense VAE over
stacked frames — the audio is synthesized procedurally (no egress).

Run::

  python examples/vae/vae_audio.py max_iter=3000
"""
import numpy as np

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi import BetaVAE
from odin_tpu.networks.base import Dense, SequentialNetwork
from odin_tpu.ops.features import FeatureConfig, speech_features
from odin_tpu.training import run_hydra

CONFIG = dict(n_utts=256, sr=8000, n_mels=24, context=8, zdim=12,
              batch_size=64, max_iter=3000, lr=1e-3, beta=1.0)


def synth_corpus(n, sr, seed=0):
  """Vowel-like harmonic utterances with random f0 contours."""
  rng = np.random.RandomState(seed)
  t = np.arange(sr) / sr
  utts = []
  for _ in range(n):
    f0 = rng.uniform(90, 250)
    drift = rng.uniform(-30, 30)
    phase = 2 * np.pi * np.cumsum(f0 + drift * t) / sr
    y = sum(a * np.sin(k * phase) for k, a in
            enumerate([0.5, 0.3, 0.15, 0.05], start=1))
    utts.append((y + 0.01 * rng.randn(sr)).astype("f"))
  return np.stack(utts)


@run_hydra(output_dir="./results/vae_audio", config=CONFIG)
def main(cfg):
  audio = synth_corpus(cfg.n_utts, cfg.sr)
  # fused device path: framing -> window -> rFFT -> mel -> log in one jit
  conf = FeatureConfig(sr=cfg.sr, frame_length=int(0.025 * cfg.sr),
                       step_length=int(0.010 * cfg.sr), n_fft=256,
                       n_mels=cfg.n_mels)
  mels = np.asarray(speech_features(audio, conf)["mspec"])  # (N, T, mel)
  # stack `context` frames into fixed-size training vectors
  T = (mels.shape[1] // cfg.context) * cfg.context
  X = mels[:, :T].reshape(-1, cfg.context * cfg.n_mels)
  X = (X - X.mean(0)) / (X.std(0) + 1e-6)
  D = X.shape[-1]

  def mlp(name):
    return SequentialNetwork((Dense(256, "relu"), Dense(256, "relu")),
                             name=name)

  vae = BetaVAE(
      beta=cfg.beta, encoder=mlp("encoder"), decoder=mlp("decoder"),
      latents=RVconf(cfg.zdim, "mvndiag", projection=True, name="latents"),
      observation=RVconf((D,), "gaussian", projection=True,
                         name="observation"),
      input_shape=(D,)).build()

  rng = np.random.RandomState(1)

  def it(n):
    for _ in range(n):
      yield X[rng.randint(0, len(X), cfg.batch_size)]

  trainer = vae.fit(it(cfg.max_iter), max_iter=cfg.max_iter,
                    learning_rate=cfg.lr, logdir=cfg.output_dir)
  print("final:", {k: round(float(v), 4)
                   for k, v in trainer.history[-1].items()
                   if isinstance(v, (int, float))})
  return trainer.history[-1]


if __name__ == "__main__":
  main()
