"""Corpus feature processor.

Reference: ``odin/preprocessing/processor.py`` — `FeatureProcessor(jobs,
path, extractor, ncpu).run()` (:406,557-740): fans the Extractor pipeline
over files via the host job map, appends features to MmapArray with
per-utterance (start, end) indices in MmapDict, accumulates sum1/sum2 corpus
statistics, logs errors, `validate_features` report, `calculate_pca`
post-pass (:41,98).

TPU addition: `batch_speech_features` runs the FUSED device pipeline over
padded batches of raw audio (`odin_tpu.ops.features.speech_features`) —
files are only decoded on host; framing/FFT/mel/MFCC/CMVN/VAD run on the
accelerator.
"""
from __future__ import annotations

import os
import traceback
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from odin_tpu.fuel.databases import MmapArray, MmapArrayWriter, MmapDict
from odin_tpu.fuel.dataset import Dataset
from odin_tpu.preprocessing.base import ExtractorSignal, Pipeline
from odin_tpu.utils.mpi import MPI

__all__ = ["FeatureProcessor", "DeviceCorpusProcessor", "validate_features",
           "calculate_pca", "batch_speech_features"]


class FeatureProcessor:
  """Fan an extractor pipeline over a corpus and persist the outputs."""

  def __init__(self,
               jobs: Sequence[Any],
               path: str,
               extractor: Pipeline,
               n_cache: int = 120,
               ncpu: int = 1,
               override: bool = False,
               identifier: str = "name",
               log_path: Optional[str] = None,
               stop_on_failure: bool = False):
    self.jobs = list(jobs)
    self.path = str(path)
    self.extractor = extractor
    self.n_cache = int(n_cache)
    self.ncpu = int(ncpu)
    self.identifier = identifier
    self.stop_on_failure = bool(stop_on_failure)
    self.log_path = log_path or os.path.join(self.path, "log.txt")
    if override and os.path.exists(self.path):
      import shutil
      shutil.rmtree(self.path)
    os.makedirs(self.path, exist_ok=True)

  def run(self) -> Dataset:
    """Process all jobs; returns the output Dataset folder."""
    writers: Dict[str, MmapArrayWriter] = {}
    indices: Dict[str, MmapDict] = {}
    sum1: Dict[str, np.ndarray] = {}
    sum2: Dict[str, np.ndarray] = {}
    errors: List[str] = []
    counters = defaultdict(int)

    def _map(batch_jobs):
      # generator: one (status, result) per job, streamed back by MPI
      for job in batch_jobs:
        try:
          feat = self.extractor.transform(job)
          yield ("ok", feat)
        except ExtractorSignal as e:
          yield (e.action, f"{e.extractor}: {e.message}")
        except Exception:
          yield ("error", traceback.format_exc())

    mpi = MPI(jobs=self.jobs, func=_map, ncpu=self.ncpu, batch=1)
    for status, result in mpi:
      if status != "ok":
        errors.append(str(result))
        if status == "error" and self.stop_on_failure:
          raise RuntimeError(result)
        continue
      feat: Dict[str, Any] = result
      name = str(feat.get(self.identifier, counters["_n"]))
      counters["_n"] += 1
      for key, value in feat.items():
        if not isinstance(value, np.ndarray) or value.ndim == 0:
          continue
        if value.dtype == bool:
          value = value.astype("uint8")
        if value.ndim == 1:
          value = value[:, None]
        if key not in writers:
          writers[key] = MmapArrayWriter(
              os.path.join(self.path, key),
              shape=(0,) + value.shape[1:], dtype=value.dtype.name)
          indices[key] = MmapDict(os.path.join(self.path, f"indices_{key}"))
        w = writers[key]
        start = w.n_rows
        w.write(value)
        indices[key][name] = (start, w.n_rows)
        if value.dtype.kind == "f":
          s1 = value.sum(axis=0)
          s2 = (value.astype(np.float64) ** 2).sum(axis=0)
          if key in sum1:
            sum1[key] += s1
            sum2[key] += s2
          else:
            sum1[key] = s1.astype(np.float64)
            sum2[key] = s2
    # finalize
    ds = Dataset(self.path)
    for key, w in writers.items():
      w.close()
      indices[key].close()
    for key in sum1:
      np.save(os.path.join(self.path, f"{key}_sum1.npy"), sum1[key])
      np.save(os.path.join(self.path, f"{key}_sum2.npy"), sum2[key])
    with open(self.log_path, "w") as f:
      f.write(f"jobs: {len(self.jobs)}\nprocessed: {counters['_n']}\n"
              f"errors: {len(errors)}\n\n")
      f.write("\n".join(errors))
    ds._scan()
    return ds


def validate_features(dataset: Union[str, Dataset],
                      feat_name: str = "mspec") -> Dict[str, Any]:
  """Sanity report over a processed corpus (reference `validate_features`):
  NaN/inf counts, per-utterance length stats (reference :406)."""
  if isinstance(dataset, str):
    dataset = Dataset(dataset)
  arr = dataset[feat_name]
  idx = dataset[f"indices_{feat_name}"]
  lengths = [end - start for start, end in idx.values()]
  sample = np.asarray(arr[:min(len(arr), 100000)])
  return dict(
      n_utterances=len(idx),
      n_frames=int(arr.shape[0]),
      feat_dim=tuple(arr.shape[1:]),
      n_nan=int(np.isnan(sample).sum()),
      n_inf=int(np.isinf(sample).sum()),
      length_min=int(np.min(lengths)) if lengths else 0,
      length_max=int(np.max(lengths)) if lengths else 0,
      length_mean=float(np.mean(lengths)) if lengths else 0.0,
  )


def calculate_pca(dataset: Union[str, Dataset], feat_name: str = "mspec",
                  n_components: int = 20, batch_size: int = 8192):
  """Incremental PCA over a stored feature (reference ``processor.py:98``)."""
  from sklearn.decomposition import IncrementalPCA
  if isinstance(dataset, str):
    dataset = Dataset(dataset)
  arr = dataset[feat_name]
  n_components = min(n_components, arr.shape[1])
  batch_size = max(batch_size, 2 * n_components)
  pca = IncrementalPCA(n_components=n_components)
  for i in range(0, arr.shape[0], batch_size):
    chunk = np.asarray(arr[i:i + batch_size])
    if len(chunk) >= n_components:
      pca.partial_fit(chunk)
  import pickle
  with open(os.path.join(dataset.path, f"{feat_name}_pca.pkl"), "wb") as f:
    pickle.dump(pca, f)
  return pca


def batch_speech_features(utterances: Sequence[np.ndarray],
                          config=None,
                          batch_size: int = 64,
                          features: Sequence[str] = ("mspec", "mfcc", "vad"),
                          pad_to: Optional[int] = None,
                          transfer_dtype: Optional[Any] = None) -> List[Dict[str, np.ndarray]]:
  """Device-accelerated corpus extraction: pad utterances into fixed-shape
  batches, run the fused pipeline once per batch, strip padding.

  The TPU replacement for the reference's per-file multiprocess map — the
  host only decodes/pads; all DSP runs in one jit per batch shape.

  Raw-transfer policy: when every utterance is already int16 PCM (or uint8
  G.711 mu-law codewords), the batch ships in that dtype and is rescaled/
  expanded ON DEVICE — 2x (4x for mu-law) fewer bytes over the link, exact
  for the source format.  Pass ``transfer_dtype=np.float32`` to force the
  old host-side conversion, or ``np.int16`` to force raw PCM for float
  inputs.  (An r2-era note here claimed the int16 transfer was ~40x slower
  on this runtime; re-measured 2026-08-19 the raw path is decisively
  FASTER in every paired run — bench.py's int16 mel metric and
  benchmarks/ingest_bench.py record the numbers.)
  """
  import jax
  import jax.numpy as jnp
  from odin_tpu.ops.features import FeatureConfig, speech_features
  config = config or FeatureConfig()
  out: List[Dict[str, np.ndarray]] = []
  if pad_to is None:
    pad_to = max(len(u) for u in utterances)
  if transfer_dtype is None:
    dtypes = {np.asarray(u).dtype for u in utterances}
    transfer_dtype = dtypes.pop() if len(dtypes) == 1 and dtypes.issubset(
        {np.dtype(np.int16), np.dtype(np.uint8)}) else np.float32
  transfer_dtype = np.dtype(transfer_dtype)
  # mu-law code 0xFF decodes to exactly 0 — the correct pad value
  pad_value = 0xFF if transfer_dtype == np.uint8 else 0
  fn = jax.jit(lambda y, l: speech_features(y, config, lengths=l))
  for i in range(0, len(utterances), batch_size):
    chunk = utterances[i:i + batch_size]
    lengths = np.array([min(len(u), pad_to) for u in chunk], np.int32)
    batch = np.full((len(chunk), pad_to), pad_value, transfer_dtype)
    for j, u in enumerate(chunk):
      u = np.asarray(u)[:pad_to]
      if u.dtype != transfer_dtype:
        if transfer_dtype == np.uint8:
          raise ValueError("uint8 (mu-law) transfer requires every "
                           "utterance to already hold G.711 codewords")
        if transfer_dtype == np.int16:
          u = np.clip(u * 32768.0, -32768, 32767).astype(np.int16)
        elif u.dtype == np.int16:
          u = u.astype(np.float32) * (1.0 / 32768.0)
        elif u.dtype == np.uint8:
          from odin_tpu.preprocessing.speech import _ulaw_expand
          u = _ulaw_expand(u)
        else:
          u = u.astype(transfer_dtype)
      batch[j, :lengths[j]] = u
    res = fn(jnp.asarray(batch), jnp.asarray(lengths))
    res = {k: np.asarray(v) for k, v in res.items() if k in features or
           k == "frame_mask"}
    for j in range(len(chunk)):
      n = int(res["frame_mask"][j].sum())
      out.append({k: v[j][:n] for k, v in res.items() if k != "frame_mask"})
  return out


class DeviceCorpusProcessor:
  """Corpus-scale TPU feature extraction with the FeatureProcessor on-disk
  contract (VERDICT r3 task 6; reference ``processor.py:557-740``).

  The end-to-end production path: files are decoded on host to RAW int16
  PCM (or uint8 G.711 mu-law codewords — `read_sphere(raw=True)`), padded
  into fixed-shape batches, shipped raw (2-4x fewer bytes over the link),
  rescaled/expanded ON DEVICE, and run through the fused
  framing->window->rFFT->mel->DCT->delta->CMVN->VAD kernel; per-utterance
  slices are appended to MmapArray with ``indices_<feat>`` (start, end)
  MmapDicts and float64 sum1/sum2 corpus statistics — byte-compatible with
  `FeatureProcessor` outputs, so `validate_features`/`calculate_pca` and
  the `Dataset` container work unchanged.

  Host decode/pad of batch k+1 overlaps device compute of batch k
  (jax dispatch is async; `pipeline_depth` bounds in-flight buffers).
  """

  def __init__(self,
               files: Sequence[Any],
               path: str,
               config=None,
               features: Sequence[str] = ("mspec", "mfcc_cmvn", "vad"),
               batch_size: int = 64,
               pad_seconds: Optional[float] = None,
               reader: Optional[Callable] = None,
               override: bool = False,
               pipeline_depth: int = 3,
               transfer_dtype: Optional[str] = None):
    from odin_tpu.ops.features import FeatureConfig
    self.files = list(files)
    self.path = str(path)
    self.config = config or FeatureConfig()
    self.features = tuple(features)
    self.batch_size = int(batch_size)
    self.pad_seconds = pad_seconds
    self.reader = reader
    self.pipeline_depth = int(pipeline_depth)
    # 'float16' halves the device->host feature stream — the measured
    # bottleneck on a tunneled chip (phase decomposition: device_wait
    # 81.5% of wall-clock) — at ~1e-3 relative error; values are cast
    # back to float32 before hitting the on-disk contract
    self.transfer_dtype = transfer_dtype
    if override and os.path.exists(self.path):
      import shutil
      shutil.rmtree(self.path)
    os.makedirs(self.path, exist_ok=True)

  def _read(self, f):
    """-> (name, samples int16/uint8/float32).  Dispatches on extension;
    .sph ships raw mu-law codewords, .wav raw int16 PCM."""
    if self.reader is not None:
      return self.reader(f)
    from odin_tpu.preprocessing.speech import read_sphere, read_wave_raw
    name = os.path.basename(f) if isinstance(f, str) else str(f[0])
    if not isinstance(f, str):
      return name, np.asarray(f[1])
    if f.lower().endswith(".sph"):
      y, _ = read_sphere(f, raw=True)
    else:
      y, _ = read_wave_raw(f)
    return name, y

  def run(self, verbose: bool = False) -> Dataset:
    import time as _time
    import jax
    import jax.numpy as jnp
    from odin_tpu.ops.features import speech_features

    cfg = self.config
    writers: Dict[str, MmapArrayWriter] = {}
    indices: Dict[str, MmapDict] = {}
    sum1: Dict[str, np.ndarray] = {}
    sum2: Dict[str, np.ndarray] = {}
    frame_counts: Dict[str, int] = defaultdict(int)
    # per-phase wall-clock decomposition (VERDICT r4 task 5): where the
    # sustained rate actually goes on a 1-core host + tunneled chip
    phase = dict(decode=0.0, pad=0.0, dispatch=0.0, device_wait=0.0,
                 write=0.0)

    keep = tuple(self.features) + ("frame_mask",)
    tdt = np.dtype(self.transfer_dtype) if self.transfer_dtype else None

    def _extract(y, l):
      out = {k: v for k, v in speech_features(y, cfg, lengths=l).items()
             if k in keep}
      if tdt is not None:
        out = {k: (v.astype(tdt) if v.dtype == jnp.float32 else v)
               for k, v in out.items()}
      return out

    fn = jax.jit(_extract)

    def _drain(entry):
      names, res = entry
      t1 = _time.time()
      res = {k: np.asarray(v) for k, v in res.items()}
      if tdt is not None:
        res = {k: (v.astype(np.float32) if v.dtype == tdt else v)
               for k, v in res.items()}
      phase["device_wait"] += _time.time() - t1
      t1 = _time.time()
      mask = np.asarray(res.pop("frame_mask"), bool)
      n_frames = mask.sum(axis=1).astype(int)
      ends = np.cumsum(n_frames)
      starts = ends - n_frames
      for key, batch_vals in res.items():
        # valid frames are a per-row prefix: one vectorized gather replaces
        # the per-utterance slicing, ONE file append replaces B small ones,
        # and the float64 corpus stats reduce once per batch per feature
        flat = batch_vals[mask]
        if flat.dtype == bool:
          flat = flat.astype("uint8")
        if flat.ndim == 1:
          flat = flat[:, None]
        if key not in writers:
          writers[key] = MmapArrayWriter(
              os.path.join(self.path, key),
              shape=(0,) + flat.shape[1:], dtype=flat.dtype.name)
          indices[key] = MmapDict(os.path.join(self.path,
                                               f"indices_{key}"))
        w = writers[key]
        base = w.n_rows
        w.write(flat)
        idx = indices[key]
        for j, name in enumerate(names):
          idx[name] = (base + int(starts[j]), base + int(ends[j]))
        frame_counts[key] += len(flat)
        if flat.dtype.kind == "f":
          s1 = flat.sum(axis=0, dtype=np.float64)
          s2 = (flat.astype(np.float64) ** 2).sum(axis=0)
          if key in sum1:
            sum1[key] += s1
            sum2[key] += s2
          else:
            sum1[key] = s1
            sum2[key] = s2
      phase["write"] += _time.time() - t1

    t0 = _time.time()
    pending: List[Any] = []
    total_frames = 0
    pad_to = (int(self.pad_seconds * cfg.sr) if self.pad_seconds else None)
    for i in range(0, len(self.files), self.batch_size):
      t1 = _time.time()
      chunk = [self._read(f) for f in self.files[i:i + self.batch_size]]
      phase["decode"] += _time.time() - t1
      t1 = _time.time()
      names = [c[0] for c in chunk]
      ys = [c[1] for c in chunk]
      T = pad_to or max(len(y) for y in ys)
      dt = ys[0].dtype if all(y.dtype == ys[0].dtype for y in ys) \
          else np.float32
      pad_value = 0xFF if dt == np.uint8 else 0  # mu-law 0xFF decodes to 0
      batch = np.full((len(ys), T), pad_value, dt)
      lengths = np.empty(len(ys), np.int32)
      for j, y in enumerate(ys):
        y = y[:T]
        lengths[j] = len(y)
        batch[j, :len(y)] = y if y.dtype == dt else y.astype(dt)
      total_frames += int(np.sum(cfg.n_frames(lengths)))
      phase["pad"] += _time.time() - t1
      t1 = _time.time()
      res = fn(jnp.asarray(batch), jnp.asarray(lengths))
      # start the device->host copies NOW so they overlap the next batch's
      # decode/pad instead of serializing inside _drain's np.asarray
      for v in res.values():
        try:
          v.copy_to_host_async()
        except AttributeError:  # non-jax leaves (should not happen)
          pass
      pending.append((names, res))
      phase["dispatch"] += _time.time() - t1
      if len(pending) >= self.pipeline_depth:
        _drain(pending.pop(0))
      if verbose and (i // self.batch_size) % 20 == 0:
        rate = total_frames / max(_time.time() - t0, 1e-9)
        print(f"[DeviceCorpusProcessor] {i + len(names)}/{len(self.files)} "
              f"files, {rate / 1e6:.2f}M frames/s sustained", flush=True)
    while pending:
      _drain(pending.pop(0))
    wall = _time.time() - t0

    ds = Dataset(self.path)
    for key, w in writers.items():
      w.close()
      indices[key].close()
    for key in sum1:
      np.save(os.path.join(self.path, f"{key}_sum1.npy"), sum1[key])
      np.save(os.path.join(self.path, f"{key}_sum2.npy"), sum2[key])
    phase = {k: round(v, 2) for k, v in phase.items()}
    with open(os.path.join(self.path, "log.txt"), "w") as f:
      f.write(f"files: {len(self.files)}\nframes: {total_frames}\n"
              f"wallclock_sec: {wall:.1f}\n"
              f"frames_per_sec: {total_frames / max(wall, 1e-9):.0f}\n"
              f"phase_sec: {phase}\n")
    ds._scan()
    ds.attrs = dict(frames=total_frames, wallclock_sec=wall,
                    frames_per_sec=total_frames / max(wall, 1e-9),
                    phase_sec=phase)
    return ds
