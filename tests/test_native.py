"""Native C++ IO engine vs the pure-python paths."""
import os
import wave

import numpy as np
import pytest

from odin_tpu.native import (decode_wav, frame_signal_native, native_available,
                             pack_batch)
from odin_tpu.preprocessing.signal import get_window, segment_axis
from odin_tpu.preprocessing.speech import read_wave

RNG = np.random.RandomState(21)


def _write_wav(path, y, sr=16000, width=2):
  with wave.open(path, "wb") as w:
    w.setnchannels(1)
    w.setsampwidth(width)
    w.setframerate(sr)
    if width == 2:
      w.writeframes((y * 32767).astype(np.int16).tobytes())
    else:
      w.writeframes(((y * 127) + 128).astype(np.uint8).tobytes())


def test_native_builds():
  assert native_available(), "g++ build of libodin_io failed"


def test_decode_matches_python(tmp_path):
  y = (RNG.randn(8000) * 0.1).astype("f")
  p = str(tmp_path / "a.wav")
  _write_wav(p, y)
  y_native, sr = decode_wav(p)
  y_py, sr2 = read_wave(p)
  assert sr == sr2 == 16000
  np.testing.assert_allclose(y_native, y_py, atol=2e-5)


def test_pack_batch(tmp_path):
  paths = []
  refs = []
  for i in range(5):
    y = (RNG.randn(4000 + 500 * i) * 0.1).astype("f")
    p = str(tmp_path / f"u{i}.wav")
    _write_wav(p, y)
    paths.append(p)
    refs.append(y)
  batch, lengths, srs = pack_batch(paths, 8000)
  assert batch.shape == (5, 8000)
  for i, y in enumerate(refs):
    assert lengths[i] == len(y)
    # int16 write/read round-trip quantization bound
    np.testing.assert_allclose(batch[i, :len(y)], y, atol=1e-4)
    assert batch[i, len(y):].sum() == 0
  # unparseable entries produce zero-length rows, not crashes
  batch2, lengths2, _ = pack_batch(paths[:1] + [str(tmp_path / "nope.wav")],
                                   8000)
  assert lengths2[1] == 0


def test_frame_signal_matches_segment_axis():
  y = RNG.randn(16000).astype("f")
  w = get_window("hann", 400).astype("f")
  f_native = frame_signal_native(y, 400, 160, w)
  f_ref = segment_axis(y, 400, 160, end="cut") * w
  np.testing.assert_allclose(f_native, f_ref, atol=1e-6)


def test_native_gather_matches_numpy():
  """`native.gather` == numpy fancy indexing bit-for-bit for every dtype
  the pipeline feeds (native/odin_io.cpp `odin_gather`); `DataPipeline`
  routes contiguous arrays through it."""
  from odin_tpu.native import gather, native_available
  rng = np.random.RandomState(0)
  for dtype in (np.float32, np.uint8, np.int16, np.float64):
    arr = (rng.rand(100, 7, 3) * 100).astype(dtype)
    idx = rng.randint(0, 100, 33)
    np.testing.assert_array_equal(gather(arr, idx), arr[idx])
  # preallocated out buffer + 1-D items
  arr = rng.rand(50, 4).astype("f")
  idx = rng.randint(0, 50, 16)
  out = np.empty((16, 4), np.float32)
  res = gather(arr, idx, out=out)
  assert res is out
  np.testing.assert_array_equal(out, arr[idx])
  # non-contiguous falls back transparently
  nc = arr[:, ::2]
  np.testing.assert_array_equal(gather(nc, idx), nc[idx])
  # pipeline integration: shuffled epoch content identical to numpy path
  from odin_tpu.fuel.pipeline import DataPipeline
  data = rng.rand(40, 5).astype("f")
  batches = list(DataPipeline(data, batch_size=8, shuffle=True, seed=3,
                              prefetch=0))
  ref_rng = np.random.RandomState(3)
  order = ref_rng.permutation(40)
  np.testing.assert_array_equal(np.concatenate(batches), data[order])
  assert native_available()  # g++ is baked into this image
