"""tf.signal fidelity of the TF-compat feature path (VERDICT r2 weak #6).

The reference has TWO numeric feature paths: the NumPy ``signal.py`` kernels
(bit-exactness held by tests/test_signal.py) and the tf.signal path of
`AudioFeatureLoader` (``odin/fuel/audio_data.py:17-80``) — HTK mel scale,
periodic Hann, no pre-emphasis, per-utterance top_dB floor, orthogonally
scaled DCT-II MFCCs.  This module executes REAL tf.signal ops (TensorFlow is
importable here) with the reference's exact call pattern (:210-269) and
holds `ops.features.tf_signal_features` + `AudioFeatureLoader(compat='tf')`
to fp32 tolerance against them.

Marked slow: importing TensorFlow costs ~30 s on this 1-core box.
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from odin_tpu.ops.features import TFCompatConfig, tf_mel_matrix, \
    tf_signal_features

pytestmark = pytest.mark.slow

SR = 8000
CFG = dict(frame_length=256, frame_step=80, sample_rate=SR,
           num_mel_bins=20, lower_edge_hertz=125.0, upper_edge_hertz=3800.0)


def _utterances(n=3, T=4000, seed=0):
  rng = np.random.RandomState(seed)
  # band-limited-ish signals with different amplitudes exercise the
  # per-utterance dB floor
  t = np.arange(T) / SR
  out = []
  for i in range(n):
    f = 200.0 + 700.0 * i
    y = (np.sin(2 * np.pi * f * t) * (0.1 + 0.4 * i)
         + 0.01 * rng.randn(T))
    out.append(y.astype(np.float32))
  return np.stack(out)


def _tf_reference(y, cfg: TFCompatConfig, log_mels=False):
  """Faithful transcription of the reference loader's per-utterance map
  (``odin/fuel/audio_data.py:210-269``) executed with real tf.signal."""
  s = tf.signal.stft(tf.constant(y), frame_length=cfg.frame_length,
                     frame_step=cfg.frame_step, fft_length=cfg.fft_length,
                     window_fn=tf.signal.hann_window, pad_end=False)
  mag = tf.math.abs(s)
  if cfg.power > 1.0:
    mag = tf.math.pow(mag, cfg.power)
  mel_weight = tf.signal.linear_to_mel_weight_matrix(
      num_mel_bins=cfg.num_mel_bins,
      num_spectrogram_bins=cfg.fft_length // 2 + 1,
      sample_rate=cfg.sample_rate,
      lower_edge_hertz=cfg.lower_edge_hertz,
      upper_edge_hertz=cfg.upper_edge_hertz,
      dtype=tf.float32)

  def amplitude_to_db(x):
    multiplier = 10.0 if cfg.power == 2.0 else 20.0
    loge10 = tf.math.log(tf.constant(10.0))
    db = multiplier * (tf.math.log(tf.maximum(x, 1e-10)) / loge10)
    if cfg.top_DB is not None:
      # reference runs per-utterance: max over each utterance alone
      ref = tf.reduce_max(db, axis=(-2, -1), keepdims=True)
      db = tf.maximum(db, ref - cfg.top_DB)
    return db

  mel = tf.matmul(mag, mel_weight)
  mels = tf.math.log(mel + 1e-6) if log_mels else amplitude_to_db(mel)
  mfcc = tf.signal.mfccs_from_log_mel_spectrograms(mels)
  return dict(stft=s.numpy(), spec=amplitude_to_db(mag).numpy(),
              mels=mels.numpy(), mfcc=mfcc.numpy())


def test_mel_matrix_matches_tf():
  """`tf_mel_matrix` must reproduce `tf.signal.linear_to_mel_weight_matrix`
  (HTK scale, first bin zeroed) to fp32 precision."""
  ours = tf_mel_matrix(20, 129, SR, 125.0, 3800.0)
  theirs = tf.signal.linear_to_mel_weight_matrix(
      20, 129, SR, 125.0, 3800.0, dtype=tf.float32).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=5e-6)
  # odd sizes / different edges
  ours2 = tf_mel_matrix(40, 257, 16000, 64.0, 7600.0)
  theirs2 = tf.signal.linear_to_mel_weight_matrix(
      40, 257, 16000, 64.0, 7600.0, dtype=tf.float32).numpy()
  np.testing.assert_allclose(ours2, theirs2, rtol=2e-4, atol=5e-6)


@pytest.mark.parametrize("log_mels", [False, True])
def test_tf_signal_features_match(log_mels):
  """STFT / dB-spec / (log-)mel / MFCC of the JAX TF-compat path vs real
  tf.signal within fp32 tolerance."""
  cfg = TFCompatConfig(log_mels=log_mels, **CFG)
  y = _utterances()
  ref = _tf_reference(y, cfg, log_mels=log_mels)
  ours = tf_signal_features(y, cfg)

  np.testing.assert_allclose(np.asarray(ours["stft_re"]), ref["stft"].real,
                             rtol=1e-4, atol=2e-3)
  np.testing.assert_allclose(np.asarray(ours["stft_im"]), ref["stft"].imag,
                             rtol=1e-4, atol=2e-3)
  np.testing.assert_allclose(np.asarray(ours["spec"]), ref["spec"],
                             rtol=1e-4, atol=2e-3)
  np.testing.assert_allclose(np.asarray(ours["mels"]), ref["mels"],
                             rtol=1e-4, atol=2e-3)
  np.testing.assert_allclose(np.asarray(ours["mfcc"]), ref["mfcc"],
                             rtol=1e-4, atol=5e-3)


def test_audio_feature_loader_tf_compat():
  """`AudioFeatureLoader(compat='tf')` serves the tf.signal features:
  variable-length utterances are padded, and the VALID frame prefix matches
  the reference computed per-utterance on the unpadded signal."""
  from odin_tpu.fuel.audio_data import AudioFeatureLoader
  cfg = TFCompatConfig(**CFG)
  lengths = [4000, 3200, 2400]
  ys = [_utterances(1, T, seed=i)[0] for i, T in enumerate(lengths)]
  loader = AudioFeatureLoader([(y, SR) for y in ys], sr=SR,
                              frame_length=256, frame_step=80, n_fft=256,
                              n_mels=20, fmin=125.0, fmax=3800.0,
                              feature="mels", compat="tf",
                              max_duration=4000 / SR)
  feats, _ = loader._extract()
  assert feats.shape[0] == 3 and feats.shape[-1] == 20
  for i, y in enumerate(ys):
    ref = _tf_reference(y[None], cfg)["mels"][0]
    n_valid = cfg.n_frames(len(y))
    np.testing.assert_allclose(feats[i, :n_valid], ref[:n_valid],
                               rtol=1e-4, atol=2e-3)
