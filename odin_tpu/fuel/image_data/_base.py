"""ImageDataset base: normalization + semi-supervised splitting.

Reference: ``odin/fuel/image_data/_base.py`` — normalization modes
'probs'/'tanh'/'raster' (:133-147), stratified semi-supervised splitting
with `label_percent` & `oversample_ratio` incl. fixed per-batch label count
(:260-386), sample-image plotting.

TPU note: the reference mixes labelled/unlabelled tf.data streams with
`sample_from_datasets` (and documents its 7x slowdown, :309-312); here each
batch deterministically contains ``round(oversample_ratio * batch)``
labelled rows and a mask channel — static shapes, no stream mixing, no
throughput cliff.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from odin_tpu.fuel.dataset_base import IterableDataset, get_partition
from odin_tpu.fuel.pipeline import DataPipeline

__all__ = ["ImageDataset"]


def _stratified_label_indices(y: np.ndarray, n_labeled: int,
                              seed: int) -> np.ndarray:
  """Pick `n_labeled` indices stratified by class (reference :260-300)."""
  rng = np.random.RandomState(seed)
  if y.ndim > 1:
    y_cls = y.argmax(-1)
  else:
    y_cls = y
  classes = np.unique(y_cls)
  per_class = max(1, n_labeled // len(classes))
  chosen = []
  for c in classes:
    idx = np.where(y_cls == c)[0]
    chosen.append(rng.choice(idx, size=min(per_class, len(idx)),
                             replace=False))
  chosen = np.concatenate(chosen)
  # top up to exactly n_labeled
  if len(chosen) < n_labeled:
    rest = np.setdiff1d(np.arange(len(y_cls)), chosen)
    extra = rng.choice(rest, size=n_labeled - len(chosen), replace=False)
    chosen = np.concatenate([chosen, extra])
  return np.sort(chosen[:n_labeled])


class ImageDataset(IterableDataset):
  """Image datasets with `create_dataset` parity."""

  @property
  def data_type(self) -> str:
    return "image"

  @property
  def binarized(self) -> bool:
    return False

  def normalize255(self, x: np.ndarray) -> np.ndarray:
    x = np.asarray(x)
    if x.dtype == np.uint8 or x.max() > 1.5:
      return x.astype("float32") / 255.0
    return x.astype("float32")

  def create_dataset(self,
                     partition: str = "train",
                     *,
                     batch_size: int = 32,
                     drop_remainder: bool = False,
                     shuffle: Union[bool, int] = 1000,
                     prefetch: int = 2,
                     normalize: str = "probs",
                     label_percent: Union[bool, float, int] = 0.0,
                     oversample_ratio: float = 0.5,
                     fixed_oversample: bool = True,
                     epochs: int = -1,
                     seed: int = 1,
                     binarize: bool = False,
                     to_device=None) -> DataPipeline:
    """Reference ``image_data/_base.py:171-397``.

    label_percent:
      0 / False  -> batches of x only.
      True / 1.0 -> fully-labelled (x, y) batches.
      float (0,1) or int count -> semi-supervised (x, y, mask) batches with
        `oversample_ratio` labelled rows per batch.
    """
    x, y = self._load(partition)
    x = self.normalize255(x)
    if binarize:
      x = (x > 0.5).astype("float32")
    if normalize in ("tanh",):
      x = 2.0 * x - 1.0
    elif normalize in ("raster",):
      x = x * 255.0
    elif normalize not in ("probs", None, "none"):
      raise ValueError(f"unknown normalize '{normalize}'")

    # fully unsupervised
    if label_percent in (0, 0.0, False, None) or y is None:
      return DataPipeline(x, batch_size=batch_size, shuffle=shuffle,
                          epochs=epochs, drop_remainder=drop_remainder,
                          seed=seed, prefetch=prefetch, to_device=to_device)
    y = np.asarray(y)
    if y.ndim == 1 and self.n_labels > 0:
      eye = np.eye(self.n_labels, dtype="float32")
      y = eye[y.astype("int64")]
    # fully supervised
    if label_percent in (True, 1, 1.0):
      return DataPipeline((x, y), batch_size=batch_size, shuffle=shuffle,
                          epochs=epochs, drop_remainder=drop_remainder,
                          seed=seed, prefetch=prefetch, to_device=to_device)
    # semi-supervised
    n = len(x)
    n_labeled = int(label_percent) if label_percent >= 1 else \
        int(np.round(float(label_percent) * n))
    lab_idx = _stratified_label_indices(y, n_labeled, seed)
    lab_mask = np.zeros(n, bool)
    lab_mask[lab_idx] = True
    unlab_idx = np.where(~lab_mask)[0]
    n_lab_batch = max(1, int(np.round(oversample_ratio * batch_size)))
    n_unlab_batch = batch_size - n_lab_batch
    rng = np.random.RandomState(seed)

    class _SemiPipeline:
      """Deterministic per-batch labelled/unlabelled mix."""

      steps_per_epoch = max(1, len(unlab_idx) // max(n_unlab_batch, 1))

      def __iter__(self):
        epoch = 0
        while epochs < 0 or epoch < epochs:
          order = rng.permutation(unlab_idx) if shuffle else unlab_idx
          for i in range(0, len(order) - (n_unlab_batch - 1), n_unlab_batch):
            u = order[i:i + n_unlab_batch]
            l = rng.choice(lab_idx, size=n_lab_batch,
                           replace=len(lab_idx) < n_lab_batch)
            xb = np.concatenate([x[l], x[u]], 0)
            yb = np.concatenate([y[l], np.zeros((len(u),) + y.shape[1:],
                                                y.dtype)], 0)
            mb = np.concatenate([np.ones(len(l), "float32"),
                                 np.zeros(len(u), "float32")])
            batch = (xb, yb, mb)
            if to_device is not None:
              batch = to_device(batch)
            yield batch
          epoch += 1

    return _SemiPipeline()

  def sample_images(self, n: int = 16, partition: str = "train",
                    seed: int = 1) -> np.ndarray:
    """Random sample grid (reference `sample_images`)."""
    x, _ = self._load(partition)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(x), size=min(n, len(x)), replace=False)
    return self.normalize255(x[idx])
