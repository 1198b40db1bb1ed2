"""Image preprocessing helpers (reference: ``odin/preprocessing/image.py``,
290 LoC): resize, center-crop, rotation, normalization — via PIL/numpy on
host (batch image work on device goes through jax.image)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["read_image", "resize_image", "center_crop", "rotate_image",
           "normalize_image", "batch_resize"]


def read_image(path: str, grayscale: bool = False) -> np.ndarray:
  from PIL import Image
  img = Image.open(path)
  if grayscale:
    img = img.convert("L")
  arr = np.asarray(img)
  if arr.ndim == 2:
    arr = arr[..., None]
  return arr


def resize_image(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
  from PIL import Image
  squeeze = img.shape[-1] == 1
  pil = Image.fromarray(img.squeeze(-1) if squeeze else img)
  out = np.asarray(pil.resize((size[1], size[0]), Image.BILINEAR))
  return out[..., None] if squeeze else out

def center_crop(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
  h, w = img.shape[:2]
  th, tw = size
  i = max((h - th) // 2, 0)
  j = max((w - tw) // 2, 0)
  return img[i:i + th, j:j + tw]


def rotate_image(img: np.ndarray, degrees: float) -> np.ndarray:
  from PIL import Image
  squeeze = img.shape[-1] == 1
  pil = Image.fromarray(img.squeeze(-1) if squeeze else img)
  out = np.asarray(pil.rotate(degrees, Image.BILINEAR))
  return out[..., None] if squeeze else out


def normalize_image(img: np.ndarray, mode: str = "probs") -> np.ndarray:
  img = np.asarray(img, np.float32)
  if img.max() > 1.5:
    img = img / 255.0
  if mode == "tanh":
    return 2.0 * img - 1.0
  if mode == "raster":
    return img * 255.0
  return img


def batch_resize(images, size: Tuple[int, int], method: str = "bilinear"):
  """Device-side batched resize via jax.image (the TPU path)."""
  import jax
  import jax.numpy as jnp
  images = jnp.asarray(images)
  b, _, _, c = images.shape
  return jax.image.resize(images, (b, size[0], size[1], c), method=method)


def transform_matrix_offset_center(matrix: np.ndarray, x: int, y: int) -> np.ndarray:
  """Recenter an affine matrix on the image center (reference
  ``image.py:50``)."""
  o_x = float(x) / 2 + 0.5
  o_y = float(y) / 2 + 0.5
  offset = np.array([[1, 0, o_x], [0, 1, o_y], [0, 0, 1]])
  reset = np.array([[1, 0, -o_x], [0, 1, -o_y], [0, 0, 1]])
  return offset @ matrix @ reset


def apply_transform(x: np.ndarray, transform_matrix: np.ndarray,
                    fill_mode: str = "nearest", cval: float = 0.0) -> np.ndarray:
  """Apply a 3x3 affine matrix to an HWC image, channel-by-channel
  (reference ``image.py:17``)."""
  from scipy import ndimage
  x = np.asarray(x)
  squeeze = x.ndim == 2
  if squeeze:
    x = x[..., None]
  final_affine = transform_matrix[:2, :2]
  final_offset = transform_matrix[:2, 2]
  out = np.stack([
      ndimage.affine_transform(x[..., c].astype(np.float64), final_affine,
                               final_offset, order=1, mode=fill_mode,
                               cval=cval)
      for c in range(x.shape[-1])], axis=-1).astype(x.dtype)
  return out[..., 0] if squeeze else out


def rotate(x: np.ndarray, rg: float = 20.0, fill_mode: str = "nearest",
           seed=None) -> np.ndarray:
  """Random rotation within +-`rg` degrees (reference ``image.py:59``)."""
  rng = np.random.RandomState(seed)
  theta = np.pi / 180 * rng.uniform(-rg, rg)
  m = np.array([[np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
  h, w = np.asarray(x).shape[:2]
  return apply_transform(x, transform_matrix_offset_center(m, h, w),
                         fill_mode)


def shift(x: np.ndarray, wrg: float = 0.1, hrg: float = 0.1,
          fill_mode: str = "nearest", seed=None) -> np.ndarray:
  """Random translation by fractions of width/height (reference
  ``image.py:84``)."""
  rng = np.random.RandomState(seed)
  h, w = np.asarray(x).shape[:2]
  tx = rng.uniform(-hrg, hrg) * h
  ty = rng.uniform(-wrg, wrg) * w
  m = np.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], dtype=np.float64)
  return apply_transform(x, m, fill_mode)


def zoom(x: np.ndarray, zoom_width: float = 0.9, zoom_height: float = 1.1,
         fill_mode: str = "nearest", seed=None) -> np.ndarray:
  """Random zoom sampled between the two factors (reference
  ``image.py:112``)."""
  rng = np.random.RandomState(seed)
  lo, hi = sorted((float(zoom_width), float(zoom_height)))
  zx, zy = rng.uniform(lo, hi, 2)
  m = np.array([[zx, 0, 0], [0, zy, 0], [0, 0, 1]])
  h, w = np.asarray(x).shape[:2]
  return apply_transform(x, transform_matrix_offset_center(m, h, w),
                         fill_mode)


def shear(x: np.ndarray, intensity: float = 0.2, fill_mode: str = "nearest",
          seed=None) -> np.ndarray:
  """Random shear in radians (reference ``image.py:142``)."""
  rng = np.random.RandomState(seed)
  s = rng.uniform(-intensity, intensity)
  m = np.array([[1, -np.sin(s), 0], [0, np.cos(s), 0], [0, 0, 1]])
  h, w = np.asarray(x).shape[:2]
  return apply_transform(x, transform_matrix_offset_center(m, h, w),
                         fill_mode)


__all__ += ["apply_transform", "transform_matrix_offset_center", "rotate",
            "shift", "zoom", "shear"]
