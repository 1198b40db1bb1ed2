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
