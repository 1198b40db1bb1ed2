"""Host->device input pipeline.

The reference ends its data path in ``tf.data`` (shuffle/batch/map/cache/
prefetch, ``odin/fuel/image_data/_base.py:171-397``).  The TPU-native
equivalent is a small array pipeline that shuffles/batches/maps on host and
prefetches batches to the device mesh on a background thread (sharded along
the 'data' axis), so the compiled train step never waits on the host.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["DataPipeline"]


def _length_of(arrays) -> int:
  if isinstance(arrays, dict):
    return len(next(iter(arrays.values())))
  if isinstance(arrays, (tuple, list)):
    return len(arrays[0])
  return len(arrays)


def _take(v, idx):
  # native threaded gather for contiguous ndarrays (bit-identical to
  # numpy fancy indexing; see native/odin_io.cpp `odin_gather`)
  if isinstance(v, np.ndarray) and v.flags["C_CONTIGUOUS"]:
    from odin_tpu.native import gather
    return gather(v, idx)
  return v[idx]


def _index(arrays, idx):
  if isinstance(arrays, dict):
    return {k: _take(v, idx) for k, v in arrays.items()}
  if isinstance(arrays, (tuple, list)):
    return tuple(_take(v, idx) for v in arrays)
  return _take(arrays, idx)


class DataPipeline:
  """Iterable of batches over in-memory/memory-mapped arrays.

  Args:
    arrays: array, tuple of arrays, or dict of arrays (first axis = examples).
    batch_size: examples per (global) batch.
    shuffle: buffer size semantics are not needed host-side — any truthy
      value triggers a full permutation per epoch (matching tf.data's
      behaviour for buffer >= n).
    epochs: -1 repeats forever.
    map_fn: applied per batch (host side).
    drop_remainder: drop the trailing partial batch.
    prefetch: number of batches prepared ahead on a background thread.
    to_device: optional callable (e.g. ``parallel.shard_batch``) applied to
      each batch — the device boundary.
  """

  def __init__(self,
               arrays,
               batch_size: int = 32,
               shuffle: Union[bool, int] = False,
               epochs: int = 1,
               map_fn: Optional[Callable] = None,
               drop_remainder: bool = False,
               seed: int = 1,
               prefetch: int = 2,
               to_device: Optional[Callable] = None):
    self.arrays = arrays
    self.batch_size = int(batch_size)
    self.shuffle = bool(shuffle)
    self.epochs = int(epochs)
    self.map_fn = map_fn
    self.drop_remainder = bool(drop_remainder)
    self.seed = int(seed)
    self.prefetch = int(prefetch)
    self.to_device = to_device
    self.n = _length_of(arrays)

  def __len__(self) -> int:
    per_epoch = self.n // self.batch_size if self.drop_remainder else \
        -(-self.n // self.batch_size)
    return per_epoch * max(self.epochs, 1)

  @property
  def steps_per_epoch(self) -> int:
    return self.n // self.batch_size if self.drop_remainder else \
        -(-self.n // self.batch_size)

  def _gen(self) -> Iterator:
    rng = np.random.RandomState(self.seed)
    epoch = 0
    while self.epochs < 0 or epoch < self.epochs:
      order = rng.permutation(self.n) if self.shuffle else np.arange(self.n)
      stop = self.n - (self.n % self.batch_size) if self.drop_remainder else self.n
      for i in range(0, stop, self.batch_size):
        idx = order[i:i + self.batch_size]
        if self.drop_remainder and len(idx) < self.batch_size:
          break
        batch = _index(self.arrays, idx)
        if self.map_fn is not None:
          batch = self.map_fn(batch)
        if self.to_device is not None:
          batch = self.to_device(batch)
        yield batch
      epoch += 1

  def __iter__(self) -> Iterator:
    if self.prefetch <= 0:
      yield from self._gen()
      return
    q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
    _END = object()
    error = []

    def worker():
      try:
        for b in self._gen():
          q.put(b)
      except Exception as e:  # propagate to consumer
        error.append(e)
      finally:
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
      b = q.get()
      if b is _END:
        if error:
          raise error[0]
        return
      yield b

  # -- functional-style combinators (tf.data API parity) ---------------------
  def map(self, fn: Callable) -> "DataPipeline":
    prev = self.map_fn
    new_fn = fn if prev is None else (lambda b: fn(prev(b)))
    return self._copy(map_fn=new_fn)

  def repeat(self, epochs: int = -1) -> "DataPipeline":
    return self._copy(epochs=epochs)

  def take(self, n_batches: int):
    it = iter(self)
    for _ in range(n_batches):
      yield next(it)

  def _copy(self, **overrides) -> "DataPipeline":
    kw = dict(arrays=self.arrays, batch_size=self.batch_size,
              shuffle=self.shuffle, epochs=self.epochs, map_fn=self.map_fn,
              drop_remainder=self.drop_remainder, seed=self.seed,
              prefetch=self.prefetch, to_device=self.to_device)
    kw.update(overrides)
    return DataPipeline(**kw)
