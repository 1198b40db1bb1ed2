"""Pitch tracking, audio splitting, callbacks, new distributions, NLP."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odin_tpu.preprocessing.signal import (pitch_track, resample,
                                           stack_frames, vad_split_audio)
from odin_tpu.preprocessing.speech import PitchExtractor


def test_pitch_track_accuracy():
  sr = 16000
  t = np.arange(sr * 2) / sr
  rng = np.random.RandomState(0)
  for f0 in (100, 150, 220):
    y = np.sin(2 * np.pi * f0 * t).astype("f") + \
        0.01 * rng.randn(len(t)).astype("f")
    p = pitch_track(y, sr, step_length=160)
    est = np.median(p[p > 0])
    assert abs(est - f0) / f0 < 0.02, (f0, est)
  # unvoiced noise -> no pitch
  noise = rng.randn(sr).astype("f") * 0.1
  assert (pitch_track(noise, sr, 160) > 0).mean() < 0.1


def test_pitch_extractor_stage():
  sr = 16000
  y = np.sin(2 * np.pi * 120 * np.arange(sr) / sr).astype("f")
  feat = PitchExtractor().transform({"raw": y, "sr": sr})
  assert feat["pitch"].ndim == 2
  assert abs(np.median(feat["pitch"][feat["pitch"] > 0]) - 120) < 5


def test_stack_resample_split():
  X = np.arange(20).reshape(10, 2)
  s = stack_frames(X, 5, 2)
  assert s.shape == (3, 10)
  np.testing.assert_array_equal(s[0], np.arange(10))
  y = np.sin(np.arange(16000) / 10).astype("f")
  assert resample(y, 16000, 8000).shape == (8000,)
  # spectral fidelity: a 440 Hz tone survives 16k->8k resampling with the
  # same dominant frequency and amplitude (the reference delegates to
  # resampy's kaiser filters, unavailable offline; scipy polyphase is the
  # replacement, so we assert signal quality instead of bit-exactness)
  t = np.arange(16000) / 16000.0
  tone = np.sin(2 * np.pi * 440 * t).astype("f")
  down = resample(tone, 16000, 8000)
  spec = np.abs(np.fft.rfft(down))
  assert abs(np.argmax(spec) * 8000 / len(down) - 440) < 2
  assert abs(down[200:-200].std() - tone.std()) < 0.01
  # anti-aliasing: a 5 kHz tone (above the 4 kHz Nyquist of 8 kHz) must be
  # attenuated, not folded back
  hi = np.sin(2 * np.pi * 5000 * t).astype("f")
  hid = resample(hi, 16000, 8000)
  assert hid.std() < 0.05 * hi.std()
  long = np.concatenate([y, np.zeros(8000, "f"), y])
  chunks = vad_split_audio(long, 16000, maximum_duration=1.5)
  assert all(len(c) <= 1.5 * 16000 for c in chunks)
  assert sum(len(c) for c in chunks) == len(long)


def test_normalgamma_loguniform():
  from odin_tpu.bay.distributions import LogUniform, NormalGamma
  key = jax.random.PRNGKey(0)
  ng = NormalGamma(loc=1.0, lam=2.0, alpha=3.0, beta=2.0)
  s = ng.sample(key, (20000,))
  assert s.shape == (20000, 2)
  assert abs(float(s[:, 1].mean()) - 1.5) < 0.05      # E[tau] = alpha/beta
  assert abs(float(s[:, 0].mean()) - 1.0) < 0.05      # E[x] = loc
  lp = ng.log_prob(s[:5])
  assert np.isfinite(np.asarray(lp)).all()
  lu = LogUniform(1.0, 100.0)
  sl = lu.sample(key, (20000,))
  assert float(sl.min()) >= 1.0 and float(sl.max()) <= 100.0
  assert abs(float(sl.mean()) - float(lu.mean())) < 1.0
  # density integrates to ~1 over [low, high]
  xs = np.linspace(1.0, 100.0, 20000)
  integral = np.trapezoid(np.exp(np.asarray(lu.log_prob(xs))), xs)
  assert abs(integral - 1.0) < 1e-2


def test_math_arithmetic_dataset():
  from odin_tpu.fuel.nlp_data import MathArithmetic
  ds = MathArithmetic(n_samples=500)
  x, y = ds.numpy("train")
  assert x.shape[1] == ds.maxlen
  # decode round trip is a valid equation
  prob = ds.decode(x[0])
  ans = ds.decode(y[0])
  assert eval(prob) == int(ans)


def test_best_weights_and_early_stopping():
  from odin_tpu.training import (BestWeights, EarlyStopping, TrainState,
                                 early_stopping_callback)
  import jax.numpy as jnp

  def mk_state(v):
    return TrainState(params={"w": jnp.asarray(v)}, opt_states={},
                      step=jnp.asarray(0), rng=jax.random.PRNGKey(0))

  bw = BestWeights(metric="loss")
  es = EarlyStopping(patience=2, warmup_epochs=0, progression_length=1)
  hook = early_stopping_callback(es, best_weights=bw)

  class FakeTrainer:
    terminated = False
    def terminate(self):
      self.terminated = True

  tr = FakeTrainer()
  losses = [5.0, 3.0, 2.0, 2.5, 2.6, 2.7, 2.8]
  for i, l in enumerate(losses):
    hook(tr, mk_state(float(i)), {"loss": l})
    if tr.terminated:
      break
  assert tr.terminated  # patience exhausted after the rebound
  assert float(bw.restore().params["w"]) == 2.0  # state at loss 2.0


def test_fast_lda_topics():
  from odin_tpu.ml import fast_lda_topics
  from odin_tpu.fuel import SyntheticBoW
  ds = SyntheticBoW(n_docs=300, n_words=100, n_topics=5)
  x, _ = ds.numpy("train")
  model = fast_lda_topics(x, n_topics=5, max_iter=5)
  assert model.components_.shape == (5, 100)


def test_cqt():
  from odin_tpu.preprocessing.signal import cqt
  from odin_tpu.preprocessing.speech import CQTExtractor
  sr = 16000
  t = np.arange(sr) / sr
  y = np.sin(2 * np.pi * 440 * t).astype("f")
  C = cqt(y, sr, step_length=512)
  peak = int(np.median(C.argmax(1)))
  assert peak == round(np.log2(440 / 32.70) * 12)
  # an octave up moves the peak exactly bins_per_octave bins
  C2 = cqt(np.sin(2 * np.pi * 880 * t).astype("f"), sr, step_length=512)
  assert int(np.median(C2.argmax(1))) - peak == 12
  feat = CQTExtractor().transform({"raw": y, "sr": sr})
  assert feat["cqt"].shape[1] == 84


def test_spectra_allinone_and_save_wave(tmp_path):
  """`signal.spectra` (reference :1718) composes the bit-exact kernels into
  the reference's all-in-one dict; `save_wave` round-trips with
  `read_wave` (reference speech.py:127, utils save_wav :1379)."""
  from odin_tpu.preprocessing import signal as S
  from odin_tpu.preprocessing.speech import read_wave, save_wave
  from odin_tpu.utils import save_wav
  sr = 8000
  t = np.arange(sr, dtype=np.float64) / sr
  y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("f")
  out = S.spectra(sr, frame_length=200, y=y, n_mels=24, n_ceps=13)
  assert out["spec"].shape[1] == 257
  assert out["mspec"].shape[1] == 24 and out["mfcc"].shape[1] == 13
  assert out["energy"] is not None
  for k in ("spec", "mspec", "mfcc"):
    assert np.all(np.isfinite(out[k])), k
  # composing from a precomputed power spectrogram gives the same mels
  stft_out, _ = S.stft(y, frame_length=200, n_fft=512, energy=True)
  out2 = S.spectra(sr, frame_length=200, S=np.abs(stft_out) ** 2,
                   n_mels=24, power=1)
  np.testing.assert_allclose(out["mspec"], out2["mspec"], atol=1e-4)
  # 440 Hz peak lands in the right fft bin (~440/ (8000/512) = 28)
  assert abs(int(np.argmax(out["spec"].mean(0))) - 28) <= 1
  p = str(tmp_path / "t.wav")
  save_wav(p, y, sr)
  y2, sr2 = read_wave(p)
  assert sr2 == sr and np.max(np.abs(y2 - y)) < 1e-4
  # stereo + int16 passthrough
  stereo = np.stack([y, -y], -1)
  save_wave(str(tmp_path / "s.wav"), (stereo * 32767).astype(np.int16), sr)
  ys, _ = read_wave(str(tmp_path / "s.wav"))
  assert ys.shape == stereo.shape
