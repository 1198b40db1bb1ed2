"""Native Kaldi ark/scp interop (reference odin/preprocessing/kaldi_io.py)."""
import numpy as np
import pytest

from odin_tpu.preprocessing.kaldi import (
    KaldiDataset, KaldiFeaturesReader, compute_deltas,
    compute_shifted_deltas, count_frames, read_ark, read_mat, read_scp,
    read_vec, sliding_window_cmn, write_ark)


@pytest.fixture
def ark(tmp_path):
  rng = np.random.RandomState(0)
  data = {f"utt{i}": rng.randn(50 + 10 * i, 13).astype("f")
          for i in range(5)}
  path = str(tmp_path / "feats.ark")
  scp = str(tmp_path / "feats.scp")
  specs = write_ark(path, data, scp_path=scp)
  return data, path, scp, specs


def test_ark_roundtrip(ark):
  data, path, scp, specs = ark
  for key, spec in specs.items():
    np.testing.assert_array_equal(read_mat(spec), data[key])
  loaded = dict(read_ark(path))
  assert sorted(loaded) == sorted(data)
  for key, arr in dict(read_scp(scp)).items():
    np.testing.assert_array_equal(arr, data[key])


def test_vector_and_double(tmp_path):
  v = np.arange(7, dtype="f")
  d = np.arange(12, dtype="f8").reshape(3, 4)
  specs = write_ark(str(tmp_path / "v.ark"), {"v": v, "d": d})
  np.testing.assert_array_equal(read_vec(specs["v"]), v)
  out = read_mat(specs["d"])
  assert out.dtype == np.float64
  np.testing.assert_array_equal(out, d)
  with pytest.raises(ValueError):
    read_mat(specs["v"])


def test_compressed_roundtrip(tmp_path):
  rng = np.random.RandomState(1)
  x = (rng.randn(200, 20) * 3).astype("f")
  specs = write_ark(str(tmp_path / "c.ark"), {"u": x}, compress=True)
  y = read_mat(specs["u"])
  # uint8 per-column quantization: tolerance ~ segment width
  assert np.abs(y - x).max() < 0.25
  assert np.corrcoef(y.ravel(), x.ravel())[0, 1] > 0.999


def test_count_frames(ark, tmp_path):
  data, path, scp, specs = ark
  counts = count_frames(list(specs.values()), is_matrix=True)
  assert counts == [len(data[k]) for k in specs]
  # bool SAD vectors count voiced frames; '&' concatenates
  sad = np.array([1, 1, 0, 1], "f")
  sspec = write_ark(str(tmp_path / "sad.ark"), {"s": sad})["s"]
  assert count_frames([sspec, sspec + "&" + sspec]) == [3, 6]


def test_deltas_and_cmn_semantics():
  x = np.arange(20, dtype="f")[:, None]
  d = compute_deltas(x, order=1, window=2)
  assert d.shape == (20, 2)
  # interior of a linear ramp: slope exactly 1
  np.testing.assert_allclose(d[5:-5, 1], 1.0, atol=1e-6)
  sdc = compute_shifted_deltas(x, window=1, block_shift=3, num_blocks=7)
  assert sdc.shape == (20, 8)
  cmn = sliding_window_cmn(np.ones((50, 3), "f") * 7.0, window=10)
  np.testing.assert_allclose(cmn, 0.0, atol=1e-6)
  # variance normalization -> unit scale
  rng = np.random.RandomState(2)
  y = rng.randn(500, 4).astype("f") * 5 + 3
  z = sliding_window_cmn(y, window=200, normalize_variance=True)
  assert abs(float(z.std()) - 1.0) < 0.15


def test_features_reader_pipeline(ark):
  data, path, scp, specs = ark
  reader = KaldiFeaturesReader("mfcc", delta_order=2, delta_window=2,
                               cmn_window=30, cmn_min_window=10)
  out = reader.transform(specs["utt0"])
  assert out.shape == (50, 13 * 3)
  both = reader.transform(specs["utt0"] + "&" + specs["utt1"])
  assert both.shape == (50 + 60, 39)


def test_dataset_xvector_batches(tmp_path):
  rng = np.random.RandomState(3)
  feats, sads = {}, {}
  labels = []
  for i in range(12):
    n = 80 + int(rng.randint(0, 40))
    feats[f"u{i}"] = rng.randn(n, 8).astype("f")
    sads[f"u{i}"] = (rng.rand(n) > 0.2).astype("f")
    labels.append(i % 3)
  fs = write_ark(str(tmp_path / "f.ark"), feats)
  ss = write_ark(str(tmp_path / "s.ark"), sads)
  mfcc = KaldiFeaturesReader("mfcc")
  sad = KaldiFeaturesReader("sad", is_matrix=False)
  ds = KaldiDataset({mfcc: [fs[k] for k in feats],
                     sad: [ss[k] for k in feats]},
                    sad_name="sad", labels=labels, batch_size=4,
                    post_processing="xvector", clipping=(30, 50),
                    batch_strategy="stratify", min_utt_per_batch=2,
                    seed=1)
  assert len(ds) >= 2
  (x,), y = ds[0]
  assert x.ndim == 3 and x.shape[0] == 4 and x.shape[2] == 8
  assert 30 <= x.shape[1] <= 50
  assert len(set(y.tolist())) >= 2  # stratified batches mix labels
  # deterministic per-index
  (x2,), _ = ds[0]
  np.testing.assert_array_equal(x, x2)


def test_dataset_ivector_repeats_labels(tmp_path):
  rng = np.random.RandomState(4)
  feats = {f"u{i}": rng.randn(30, 5).astype("f") for i in range(6)}
  fs = write_ark(str(tmp_path / "f.ark"), feats)
  ds = KaldiDataset({KaldiFeaturesReader("m"): list(fs.values())},
                    labels=[0, 0, 1, 1, 2, 2], batch_size=3,
                    post_processing="ivector")
  (x,), y = ds[0]
  assert x.shape == (90, 5) and len(y) == 90
