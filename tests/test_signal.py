"""Bit-exactness tests of the DSP kernels against the reference NumPy
implementations (BASELINE.md fidelity target: spectrograms bit-for-bit)."""
import numpy as np
import pytest

from odin_tpu.preprocessing import signal as S

from ref_signal_loader import load_reference_signal

REF = load_reference_signal()
RNG = np.random.RandomState(0)
Y = RNG.randn(16000).astype("float32") * 0.1  # 1s of 16kHz noise
SR = 16000
FRAME, STEP, NFFT, NMELS, NCEPS = 400, 160, 512, 40, 20


def _bitexact(a, b):
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mel_filters_bitexact():
  _bitexact(S.mel_filters(SR, NFFT, NMELS, fmin=64, fmax=8000),
            REF.mel_filters(SR, NFFT, NMELS, fmin=64, fmax=8000))


def test_dct_filters_bitexact():
  _bitexact(S.dct_filters(NCEPS, NMELS), REF.dct_filters(NCEPS, NMELS))


def test_segment_axis_bitexact():
  for end in ("cut", "pad", "wrap"):
    _bitexact(S.segment_axis(Y, 400, 160, end=end),
              REF.segment_axis(Y, 400, 160, end=end))
  _bitexact(S.segment_axis(np.arange(10), 4, 2), REF.segment_axis(np.arange(10), 4, 2))


def test_stft_bitexact():
  for window in ("hann", "hamm"):
    for padding in (False, True):
      _bitexact(S.stft(Y, FRAME, STEP, NFFT, window=window, padding=padding),
                REF.stft(Y, FRAME, STEP, NFFT, window=window, padding=padding))
  # framed input + energy
  ours, e1 = S.stft(Y, FRAME, STEP, NFFT, energy=True)
  ref, e2 = REF.stft(Y, FRAME, STEP, NFFT, energy=True)
  _bitexact(ours, ref)
  _bitexact(e1, e2)


def test_spectrogram_stack_bitexact():
  spec_ours = np.abs(S.stft(Y, FRAME, STEP, NFFT)) ** 2
  spec_ref = np.abs(REF.stft(Y, FRAME, STEP, NFFT)) ** 2
  _bitexact(spec_ours, spec_ref)
  mel_ours = S.mels_spectrogram(spec_ours, SR, NMELS)
  mel_ref = REF.mels_spectrogram(spec_ref, SR, NMELS)
  _bitexact(mel_ours, mel_ref)
  mfcc_ours = S.ceps_spectrogram(mel_ours, NCEPS)
  mfcc_ref = REF.ceps_spectrogram(mel_ref, NCEPS)
  _bitexact(mfcc_ours, mfcc_ref)


def test_power2db_bitexact():
  x = RNG.rand(50, 30).astype("f") * 10
  _bitexact(S.power2db(x, top_db=80.0), REF.power2db(x, top_db=80.0))
  _bitexact(S.power2db(x, ref=np.max, top_db=60.0),
            REF.power2db(x, ref=np.max, top_db=60.0))


def test_pre_emphasis_delta_sdc_bitexact():
  _bitexact(S.pre_emphasis(Y, 0.97), REF.pre_emphasis(Y, 0.97))
  x = RNG.randn(100, 13).astype("f")
  _bitexact(S.delta(x, width=9, order=1), REF.delta(x, width=9, order=1))
  d1, d2 = S.delta(x, width=9, order=2)
  r1, r2 = REF.delta(x, width=9, order=2)
  _bitexact(d1, r1)
  _bitexact(d2, r2)
  _bitexact(S.shifted_deltas(x), REF.shifted_deltas(x))


def test_mvn_wmvn_bitexact():
  x = RNG.randn(500, 24).astype("f")
  _bitexact(S.mvn(x), REF.mvn(x))
  _bitexact(S.mvn(x, varnorm=False), REF.mvn(x, varnorm=False))
  # wmvn: ours is vectorized; reference loops — allow fp tolerance
  np.testing.assert_allclose(S.wmvn(x, w=101), REF.wmvn(x, w=101),
                             rtol=1e-4, atol=1e-4)
  idx = RNG.rand(500) > 0.3
  np.testing.assert_allclose(S.wmvn(x, w=101, indices=idx),
                             REF.wmvn(x, w=101, indices=idx),
                             rtol=1e-4, atol=1e-4)


def test_rastafilt_smooth_bitexact():
  x = RNG.randn(200, 24).astype("f")
  _bitexact(S.rastafilt(x), REF.rastafilt(x))
  v = RNG.randn(300).astype("f")
  _bitexact(S.smooth(v, win=11, window="hanning"),
            REF.smooth(v, win=11, window="hanning"))


def test_vad_energy_matches_reference():
  frames = S.segment_axis(Y, FRAME, STEP, end="cut")
  log_e = S.get_energy(frames).ravel()
  ours, thr1 = S.vad_energy(log_e)
  ref, thr2 = REF.vad_energy(log_e)
  assert abs(float(thr1) - float(thr2)) < 1e-6
  np.testing.assert_array_equal(ours, ref)


def test_istft_roundtrip():
  spec = S.stft(Y, FRAME, STEP, NFFT, window="hann")
  y_rec = S.istft(spec, FRAME, STEP, window="hann")
  n = min(len(Y), len(y_rec))
  # interior reconstruction error should be small
  err = np.abs(y_rec[FRAME:n - FRAME] - Y[FRAME:n - FRAME])
  assert float(np.mean(err)) < 1e-3


def test_pad_sequences():
  seqs = [np.ones((3, 2)), np.ones((5, 2)) * 2]
  out = S.pad_sequences(seqs, padding="post")
  assert out.shape == (2, 5, 2)
  assert out[0, 3:].sum() == 0
