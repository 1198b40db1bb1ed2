"""Image datasets.

Reference: ``odin/fuel/image_data/`` — MNIST/BinarizedMNIST/FashionMNIST/
SVHN (``all_mnist.py:14,39,110,142``), CIFAR10/100/20 (``cifar.py:96-110``),
dSprites/Shapes3D with discretized-or-continuous factor labels
(``shapes.py:24-135,192``), CelebA (``celeba.py:14``), Omniglot, synthetic
`YDisentanglement` (``synthesize.py:9``), `HalfMoons` (``toys.py:93``).

This environment has no network egress, so loaders read arrays from
``$ODIN_TPU_HOME/datasets/<name>.npz`` (keys: x_train, y_train, x_test,
y_test[, x_valid, y_valid]) and raise a clear error otherwise.  Procedural
datasets (dSprites-style Shapes2D, YDisentanglement, HalfMoons) generate in
memory and serve as drop-in stand-ins for pipeline and Gym testing.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from odin_tpu.fuel.dataset_base import get_partition
from odin_tpu.fuel.image_data._base import ImageDataset
from odin_tpu.utils import get_data_path

__all__ = [
    "NPZImageDataset", "MNIST", "FashionMNIST", "BinarizedMNIST",
    "HalfMNIST", "BinarizedAlphaDigits", "SVHN", "CIFAR10", "CIFAR100",
    "CIFAR20", "CelebA", "CelebASmall", "CelebABig", "Omniglot", "dSprites",
    "dSpritesSmall", "dSprites0", "Shapes3D", "Shapes3DSmall", "Shapes3D0",
    "HalfMoons", "HalfMoonsImage", "make_halfmoons", "YDisentanglement",
]


class NPZImageDataset(ImageDataset):
  """Load a dataset from ``<data_path>/<name>.npz``."""

  _name: str = ""
  _shape: Tuple[int, ...] = ()
  _labels: List[str] = []
  _valid_fraction: float = 0.1

  def __init__(self, path: Optional[str] = None, seed: int = 1):
    super().__init__(seed=seed)
    self.path = path or os.path.join(get_data_path(), f"{self._name}.npz")
    self._cache = None

  @property
  def name(self) -> str:
    return self._name

  @property
  def shape(self):
    return tuple(self._shape)

  @property
  def labels(self):
    return list(self._labels)

  def _arrays(self):
    if self._cache is None:
      if not os.path.exists(self.path):
        raise FileNotFoundError(
            f"dataset '{self._name}' not found at {self.path}; this "
            "environment has no network egress — place an .npz with keys "
            "x_train/y_train/x_test/y_test there (see fuel/image_data "
            "docstring), or use the procedural datasets (dSpritesSmall, "
            "Shapes3DSmall, YDisentanglement, HalfMoons) for testing")
      self._cache = dict(np.load(self.path, allow_pickle=False))
    return self._cache

  def _load(self, partition: str):
    arr = self._arrays()
    if "x_valid" not in arr:
      n = len(arr["x_train"])
      k = int(n * (1 - self._valid_fraction))
      arr["x_valid"] = arr["x_train"][k:]
      arr["x_train"] = arr["x_train"][:k]
      if "y_train" in arr:
        arr["y_valid"] = arr["y_train"][k:]
        arr["y_train"] = arr["y_train"][:k]
    key = get_partition(partition, train="train", valid="valid", test="test")
    return arr[f"x_{key}"], arr.get(f"y_{key}")


class MNIST(NPZImageDataset):
  """Reference ``all_mnist.py:39``."""
  _name = "mnist"
  _shape = (28, 28, 1)
  _labels = [str(i) for i in range(10)]


class FashionMNIST(NPZImageDataset):
  _name = "fashionmnist"
  _shape = (28, 28, 1)
  _labels = ["T-shirt", "Trouser", "Pullover", "Dress", "Coat", "Sandal",
             "Shirt", "Sneaker", "Bag", "Ankle_boot"]


class BinarizedMNIST(MNIST):
  """Reference ``all_mnist.py:14`` — pre-binarized MNIST."""
  _name = "binarizedmnist"

  @property
  def binarized(self):
    return True

  def create_dataset(self, *args, **kwargs):
    kwargs.setdefault("binarize", True)
    return super().create_dataset(*args, **kwargs)


class HalfMNIST(MNIST):
  """MNIST with only half the training examples (reference
  ``all_mnist.py:69``); valid/test untouched."""

  @property
  def name(self) -> str:
    return "halfmnist"

  def _load(self, partition: str):
    x, y = super()._load(partition)
    if get_partition(partition, train=True, valid=False, test=False):
      n = len(x) // 2
      x = x[:n]
      y = None if y is None else y[:n]
    return x, y


class BinarizedAlphaDigits(BinarizedMNIST):
  """Binary 20x16 digits '0'-'9' and capitals 'A'-'Z', 39 examples per
  class (reference ``all_mnist.py:78``); npz-gated, single array split
  70/10/20 into train/valid/test like the reference's tfds splits."""

  _name = "binaryalphadigits"
  _shape = (20, 16, 1)
  _labels = ([str(i) for i in range(10)] +
             [chr(ord("A") + i) for i in range(26)])

  def _load(self, partition: str):
    arr = self._arrays()
    if "x_valid" not in arr or "x_test" not in arr:
      x, y = arr["x_train"], arr.get("y_train")
      n = len(x)
      a, b = int(0.7 * n), int(0.8 * n)
      arr["x_train"], arr["x_valid"], arr["x_test"] = x[:a], x[a:b], x[b:]
      if y is not None:
        arr["y_train"], arr["y_valid"], arr["y_test"] = y[:a], y[a:b], y[b:]
    key = get_partition(partition, train="train", valid="valid", test="test")
    return arr[f"x_{key}"], arr.get(f"y_{key}")


class SVHN(NPZImageDataset):
  _name = "svhn"
  _shape = (32, 32, 3)
  _labels = [str(i) for i in range(10)]


class CIFAR10(NPZImageDataset):
  _name = "cifar10"
  _shape = (32, 32, 3)
  _labels = ["airplane", "automobile", "bird", "cat", "deer", "dog", "frog",
             "horse", "ship", "truck"]


class CIFAR100(NPZImageDataset):
  _name = "cifar100"
  _shape = (32, 32, 3)
  _labels = [str(i) for i in range(100)]


class CIFAR20(CIFAR100):
  """CIFAR-100 coarse labels (reference ``cifar.py:96-110``)."""
  _name = "cifar20"
  _labels = [str(i) for i in range(20)]


class CelebA(NPZImageDataset):
  _name = "celeba"
  _shape = (64, 64, 3)
  _labels = [f"attr{i}" for i in range(40)]


class CelebASmall(CelebA):
  _name = "celebasmall"


class CelebABig(CelebA):
  """Original-resolution CelebA, square-cropped to (178, 178, 3)
  (reference ``celeba.py:200``)."""
  _name = "celebabig"
  _shape = (178, 178, 3)


class Omniglot(NPZImageDataset):
  _name = "omniglot"
  _shape = (28, 28, 3)


# ---------------------------------------------------------------------------
# Procedural disentanglement datasets
# ---------------------------------------------------------------------------
def _render_shapes2d(shape_id, scale, orientation, pos_x, pos_y,
                     image_size: int = 64) -> np.ndarray:
  """Vectorized renderer of dSprites-style binary sprites
  (square / ellipse / heart).

  Performance notes (all measured on this box, 2026-08-17):
  * float32 throughout — int->float division upstream silently promotes to
    float64, whose elementwise SIMD here is ~500x slower than float32
    (np.cos on 2M elements: 2.86 s f64 vs 0.005 s f32); the promotion made
    a 65k-image render take >45 min.
  * each sprite is rendered only with ITS shape's implicit function
    (grouped by shape_id) instead of evaluating all three masks everywhere.
  * integer powers are explicit multiplies (np.power on mixed-sign floats
    is ~30x slower than multiplication)."""
  f32 = np.float32
  shape_id = np.asarray(shape_id)
  n = len(shape_id)
  yy, xx = np.mgrid[0:image_size, 0:image_size].astype(f32)
  yy = (yy / f32(image_size - 1)).ravel()[None]   # (1, P)
  xx = (xx / f32(image_size - 1)).ravel()[None]
  cx = np.asarray(pos_x, f32)[:, None]
  cy = np.asarray(pos_y, f32)[:, None]
  # sprite half-size in [0.06, 0.24]
  s = np.asarray(scale, f32)[:, None] * f32(0.18) + f32(0.06)
  th = np.asarray(orientation, f32)[:, None]
  out = np.zeros((n, image_size * image_size), f32)
  # chunked: a 512-sprite block keeps every temporary ~8 MB (cache-sized);
  # monolithic temporaries measured 100+ s at 8k sprites on this box
  # (memory-bandwidth collapse), chunked runs are linear in n.
  for sid in np.unique(shape_id):
    all_rows = np.nonzero(shape_id == sid)[0]
    for c0 in range(0, len(all_rows), 512):
      rows = all_rows[c0:c0 + 512]
      dx = xx - cx[rows]                 # (R, P)
      dy = yy - cy[rows]
      cth, sth = np.cos(th[rows]), np.sin(th[rows])
      u = (cth * dx + sth * dy) / s[rows]
      v = (cth * dy - sth * dx) / s[rows]
      if sid == 0:
        mask = (np.abs(u) <= 1.0) & (np.abs(v) <= 1.0)
      elif sid == 1:
        vv = v / f32(0.6)
        mask = (u * u + vv * vv) <= 1.0
      else:
        # implicit heart curve: (x^2 + y^2 - 1)^3 - x^2 y^3 <= 0 (y up)
        hu = u * f32(1.2)
        hv = -v * f32(1.2) + f32(0.2)
        hu2 = hu * hu
        hv2 = hv * hv
        t = hu2 + hv2 - f32(1.0)
        mask = (t * t * t - hu2 * (hv2 * hv)) <= 0.0
      out[rows] = mask
  return out.reshape(n, image_size, image_size, 1)


class FullGridMixin:
  """Complete-cartesian-factor-grid protocol for procedural factor datasets
  (the reference's actual benchmark setting: budgets sized to 90% of the
  grid, ``odin/networks/image_networks.py:936-1013``).  Requires
  `factor_sizes`, `shape`, `render(factors)`, `seed`, `_cache`, `name`.
  Images render once to a uint8 .npy memmap cache; partitions are a seeded
  90/5/5 permutation split."""

  def grid_factors(self) -> np.ndarray:
    """The complete cartesian factor grid, (prod(factor_sizes), n_factors)
    int64, in C order (first factor slowest — flat index = mixed radix)."""
    return np.indices(self.factor_sizes).reshape(
        len(self.factor_sizes), -1).T.astype(np.int64)

  def _grid_cache_path(self) -> str:
    return os.path.join(get_data_path(),
                        f"{self.name}_fullgrid_u8_{self._image_size}.npy")

  def _render_grid_cached(self) -> np.ndarray:
    """Render (or memmap-load) the full grid as uint8 {0,255} images in
    grid order."""
    cache = self._grid_cache_path()
    total = int(np.prod(self.factor_sizes))
    shape = (total,) + tuple(self.shape)
    if os.path.exists(cache):
      return np.lib.format.open_memmap(cache, mode="r")
    grid = self.grid_factors()
    out = np.lib.format.open_memmap(cache + ".tmp", mode="w+",
                                    dtype=np.uint8, shape=shape)
    chunk = 16384
    for i in range(0, total, chunk):
      out[i:i + chunk] = (self.render(grid[i:i + chunk]) * 255).astype(
          np.uint8)
    out.flush()
    os.replace(cache + ".tmp", cache)
    return np.lib.format.open_memmap(cache, mode="r")

  def _load_full_grid(self, partition: str):
    key = get_partition(partition, train="train", valid="valid", test="test")
    if key in self._cache:
      return self._cache[key]
    total = int(np.prod(self.factor_sizes))
    imgs = self._render_grid_cached()
    grid = self.grid_factors().astype("float32")
    perm = np.random.RandomState(self.seed).permutation(total)
    n_train = int(0.9 * total)  # dSprites: 663,552 — the reference budget
    n_valid = (total - n_train) // 2
    sl = {"train": perm[:n_train],
          "valid": perm[n_train:n_train + n_valid],
          "test": perm[n_train + n_valid:]}[key]
    x = imgs[np.sort(sl)]  # sorted gather: sequential memmap reads
    y = grid[np.sort(sl)]
    # re-shuffle within the partition so x[:n] is a uniform draw
    order = np.random.RandomState(self.seed + 7).permutation(len(sl))
    self._cache[key] = (x[order], y[order])
    return self._cache[key]


class dSprites(FullGridMixin, ImageDataset):
  """dSprites (Matthey et al.): 3 shapes x 6 scales x 40 orientations x
  32 x 32 positions (reference ``shapes.py:24-135``).  Without the official
  .npz on disk the images are rendered procedurally — same factor structure,
  near-identical sprites.

  `continuous_factors=True` returns raw factor values instead of indices.
  """

  factor_names = ["shape", "scale", "orientation", "pos_x", "pos_y"]
  factor_sizes = [3, 6, 40, 32, 32]
  _image_size = 64

  def __init__(self, n_samples: int = 16384, continuous_factors: bool = False,
               path: Optional[str] = None, seed: int = 1,
               full_grid: bool = False):
    """``full_grid=True`` switches from `n_samples` random factor draws to
    the COMPLETE 737,280-combination cartesian factor grid — the actual
    benchmark protocol of the reference (budgets sized to 663,552 train
    samples = 90% of the grid, ``odin/networks/image_networks.py:936-1013``;
    grid cardinalities ``fuel/image_data/shapes.py:113-119``).  Images are
    rendered once to a uint8 .npy cache (~2.9 GB, ~2.5 min) and partitions
    are a seeded 90/5/5 permutation split."""
    super().__init__(seed=seed)
    self.continuous_factors = bool(continuous_factors)
    self.n_samples = int(n_samples)
    self.full_grid = bool(full_grid)
    self.path = path or os.path.join(get_data_path(), "dsprites.npz")
    self._cache = {}

  @property
  def name(self):
    return "dsprites"

  @property
  def shape(self):
    return (self._image_size, self._image_size, 1)

  @property
  def labels(self):
    return list(self.factor_names)

  def _sample_factors(self, n, rng):
    return np.stack([rng.randint(0, k, n) for k in self.factor_sizes], -1)

  def _factors_to_values(self, f):
    shape_id = f[:, 0]
    scale = f[:, 1] / max(self.factor_sizes[1] - 1, 1)
    orient = f[:, 2] / self.factor_sizes[2] * 2 * np.pi
    pos_x = 0.15 + 0.7 * f[:, 3] / max(self.factor_sizes[3] - 1, 1)
    pos_y = 0.15 + 0.7 * f[:, 4] / max(self.factor_sizes[4] - 1, 1)
    return shape_id, scale, orient, pos_x, pos_y

  def render(self, factors: np.ndarray) -> np.ndarray:
    """factors (n, 5) integer indices -> images (n, 64, 64, 1)."""
    return _render_shapes2d(*self._factors_to_values(np.asarray(factors)),
                            image_size=self._image_size)

  def _load(self, partition: str):
    if self.full_grid:
      return self._load_full_grid(partition)
    if os.path.exists(self.path):
      arr = dict(np.load(self.path, allow_pickle=False))
      x, y = arr["x_train"], arr["y_train"]
    else:
      key = get_partition(partition, train=0, valid=1, test=2)
      if key not in self._cache:
        rng = np.random.RandomState(self.seed + 123 * key)
        f = self._sample_factors(self.n_samples, rng)
        self._cache[key] = (self.render(f), f.astype("float32"))
      x, y = self._cache[key]
      return x, y
    key = get_partition(partition, train="train", valid="valid", test="test")
    n = len(x)
    splits = {"train": slice(0, int(0.8 * n)),
              "valid": slice(int(0.8 * n), int(0.9 * n)),
              "test": slice(int(0.9 * n), n)}
    return x[splits[key]], y[splits[key]].astype("float32")

  def create_dataset(self, *args, **kwargs):
    kwargs.setdefault("binarize", True)
    return super().create_dataset(*args, **kwargs)


class dSpritesSmall(dSprites):

  def __init__(self, n_samples: int = 4096, **kwargs):
    super().__init__(n_samples=n_samples, **kwargs)

  @property
  def name(self):
    return "dspritessmall"


class dSprites0(dSprites):
  """dSprites with shape-only one-hot labels (reference ``shapes.py:250``,
  the `only_shape` map); `all_labels=True` keeps all five factors as
  concatenated per-factor one-hots (reference `onehot=True`)."""

  def __init__(self, all_labels: bool = False, **kwargs):
    kwargs.pop("continuous_factors", None)
    super().__init__(continuous_factors=False, **kwargs)
    self.all_labels = bool(all_labels)

  @property
  def name(self):
    return "dsprites0"

  @property
  def labels(self):
    if self.all_labels:
      return list(self.factor_names)
    return ["square", "ellipse", "heart"]

  def _onehot_factors(self, f):
    return np.concatenate(
        [np.eye(k, dtype="float32")[f[:, i].astype(int)]
         for i, k in enumerate(self.factor_sizes)], -1)

  def _load(self, partition: str):
    x, y = super()._load(partition)
    f = np.asarray(y)
    if self.all_labels:
      return x, self._onehot_factors(f)
    return x, np.eye(3, dtype="float32")[f[:, 0].astype(int)]


class Shapes3D(FullGridMixin, ImageDataset):
  """Shapes3D (Burgess & Kim): 6 factors (reference ``shapes.py:192``).
  Without the official file, a procedural colored-sprite stand-in renders
  object hue / wall hue / floor hue / scale / shape / orientation.
  ``full_grid=True`` uses the complete 480,000-combination cartesian grid
  (the published benchmark protocol) instead of `n_samples` random draws."""

  factor_names = ["orientation", "scale", "shape", "floor_hue", "wall_hue",
                  "object_hue"]
  factor_sizes = [15, 8, 4, 10, 10, 10]
  _image_size = 64

  def __init__(self, n_samples: int = 8192, path: Optional[str] = None,
               seed: int = 1, full_grid: bool = False):
    super().__init__(seed=seed)
    self.n_samples = int(n_samples)
    self.path = path or os.path.join(get_data_path(), "shapes3d.npz")
    self.full_grid = bool(full_grid)
    self._cache = {}

  @property
  def name(self):
    return "shapes3d"

  @property
  def shape(self):
    return (self._image_size, self._image_size, 3)

  @property
  def labels(self):
    return list(self.factor_names)

  @staticmethod
  def _hue_to_rgb(h):
    h = np.asarray(h, "float32")[..., None]
    return np.clip(np.stack([
        np.abs(((h[..., 0] * 6) % 6) - 3) - 1,
        2 - np.abs(((h[..., 0] * 6 + 4) % 6) - 3),
        2 - np.abs(((h[..., 0] * 6 + 2) % 6) - 3),
    ], -1), 0, 1)

  def render(self, factors: np.ndarray) -> np.ndarray:
    f = np.asarray(factors)
    n = len(f)
    orient = f[:, 0] / self.factor_sizes[0] * 2 * np.pi
    scale = f[:, 1] / max(self.factor_sizes[1] - 1, 1)
    shape_id = np.minimum(f[:, 2], 2)
    floor_h = f[:, 3] / self.factor_sizes[3]
    wall_h = f[:, 4] / self.factor_sizes[4]
    obj_h = f[:, 5] / self.factor_sizes[5]
    mask = _render_shapes2d(shape_id, scale, orient,
                            np.full(n, 0.5, "f"), np.full(n, 0.6, "f"),
                            self._image_size)[..., 0]
    s = self._image_size
    img = np.zeros((n, s, s, 3), "float32")
    horizon = int(s * 0.65)
    img[:, :horizon, :, :] = self._hue_to_rgb(wall_h)[:, None, None, :]
    img[:, horizon:, :, :] = self._hue_to_rgb(floor_h)[:, None, None, :]
    obj_rgb = self._hue_to_rgb(obj_h)[:, None, None, :]
    img = np.where(mask[..., None] > 0, obj_rgb, img)
    return img

  def _sample_factors(self, n, rng):
    return np.stack([rng.randint(0, k, n) for k in self.factor_sizes], -1)

  def _load(self, partition: str):
    if self.full_grid:
      return self._load_full_grid(partition)
    if os.path.exists(self.path):
      arr = dict(np.load(self.path, allow_pickle=False))
      return arr["x_train"], arr["y_train"]
    key = get_partition(partition, train=0, valid=1, test=2)
    if key not in self._cache:
      rng = np.random.RandomState(self.seed + 77 * key)
      f = self._sample_factors(self.n_samples, rng)
      self._cache[key] = (self.render(f), f.astype("float32"))
    return self._cache[key]


class Shapes3DSmall(Shapes3D):

  def __init__(self, n_samples: int = 2048, **kwargs):
    super().__init__(n_samples=n_samples, **kwargs)

  @property
  def name(self):
    return "shapes3dsmall"


class Shapes3D0(Shapes3D):
  """Shapes3D with shape-only one-hot labels (reference ``shapes.py:265``);
  `all_labels=True` keeps all six factors as concatenated one-hots."""

  def __init__(self, all_labels: bool = False, **kwargs):
    super().__init__(**kwargs)
    self.all_labels = bool(all_labels)

  @property
  def name(self):
    return "shapes3d0"

  @property
  def labels(self):
    if self.all_labels:
      return list(self.factor_names)
    return ["cube", "cylinder", "sphere", "round"]

  def _load(self, partition: str):
    x, y = super()._load(partition)
    f = np.asarray(y)
    if self.all_labels:
      return x, np.concatenate(
          [np.eye(k, dtype="float32")[f[:, i].astype(int)]
           for i, k in enumerate(self.factor_sizes)], -1)
    shape_idx = self.factor_names.index("shape")
    k = self.factor_sizes[shape_idx]
    return x, np.eye(k, dtype="float32")[f[:, shape_idx].astype(int)]


def make_halfmoons(n_samples_per_factors: int = 200, image_size: int = 64,
                   marker_size: float = 12.0, seed: int = 1,
                   n_cpu: int = 1):
  """Render two-moons points as marker images with factor labels
  (reference ``toys.py:13-91``): each sample is one point drawn as a
  shape-marker (circle/square/triangle/pentagon) in one of 10 'coolwarm'
  colors on black; labels = [x, y, moon label, color*2-1, shape_idx].

  The reference rasterizes one matplotlib figure per sample over an MPI
  pool; here the markers are drawn directly in NumPy (vectorized half-plane
  tests) — same factor structure, ~100x faster, no worker pool needed
  (`n_cpu` kept for signature parity).
  """
  from sklearn import datasets as _skd
  rand = np.random.RandomState(seed=seed)
  shapes = ["o", "s", "^", "p"]
  shapes_to_idx = {v: k for k, v in enumerate(shapes)}
  colors = np.linspace(0.0, 1.0, num=10)
  n_factors = len(shapes) * len(colors)
  n_samples = n_samples_per_factors * n_factors
  shp = np.tile(shapes, [n_samples // len(shapes)])
  col = np.tile(colors, [n_samples // len(colors)])
  rand.shuffle(shp)
  rand.shuffle(col)
  x, y = _skd.make_moons(n_samples=n_samples, shuffle=True, noise=0.05,
                         random_state=rand.randint(int(1e8)))
  x = (x - x.min(0, keepdims=True)) / \
      (x.max(0, keepdims=True) - x.min(0, keepdims=True)) * 2.0 - 1.0
  # coolwarm color values (matplotlib used only for the colormap table)
  import matplotlib
  matplotlib.use("Agg")
  from matplotlib import pyplot as plt
  cmap = plt.get_cmap("coolwarm")
  rgb = np.asarray(cmap(col))[:, :3]
  # marker radius in pixels: scatter s=pt^2 area at dpi 200
  radius = np.sqrt(marker_size / np.pi) * (200.0 / 72.0)
  s = image_size
  # pixel grid; data range [-1.2, 1.2] maps onto [0, s)
  px = (x + 1.2) / 2.4 * (s - 1)
  gy, gx = np.mgrid[0:s, 0:s].astype(np.float32)
  X = np.zeros((n_samples, s, s, 3), np.uint8)
  for i in range(n_samples):
    cx, cy = px[i, 0], (s - 1) - px[i, 1]  # image rows grow downward
    dx, dy = gx - cx, gy - cy
    m = shp[i]
    if m == "o":
      mask = dx ** 2 + dy ** 2 <= radius ** 2
    elif m == "s":
      half = radius * np.sqrt(np.pi) / 2.0  # equal-area square
      mask = (np.abs(dx) <= half) & (np.abs(dy) <= half)
    elif m == "^":  # upward triangle: three half-plane tests
      r = radius * 1.4
      mask = ((dy <= r * 0.5) &
              (dy >= -r + np.abs(dx) * np.sqrt(3.0) - r * 0.5))
    else:  # regular pentagon
      r = radius * 1.2
      ang = np.arctan2(dy, dx)
      # distance to the pentagon edge at this angle (apothem / cos of the
      # angular offset from the nearest vertex direction)
      k = np.cos(np.pi / 5) / np.cos(
          (ang - np.pi / 2) % (2 * np.pi / 5) - np.pi / 5)
      mask = np.sqrt(dx ** 2 + dy ** 2) <= r * k
    X[i][mask] = np.round(rgb[i] * 255).astype(np.uint8)
  Y = np.stack([x[:, 0], x[:, 1], y.astype("f"), col * 2.0 - 1.0,
                np.asarray([shapes_to_idx[m] for m in shp], "f")], -1)
  return X, Y.astype("float32")


class HalfMoonsImage(ImageDataset):
  """Image variant of HalfMoons (the reference's actual `HalfMoons`,
  ``toys.py:93``): 64x64x3 marker renders with 5 ground-truth factors
  [pos_x, pos_y, label, color, shape].  Procedural (rendered on first use
  and cached); the repo's vector `HalfMoons` below keeps the cheap 2-D toy
  used across tests."""

  factor_names = ["pos_x", "pos_y", "label", "color", "shape"]

  def __init__(self, n_samples_per_factors: int = 25, seed: int = 1):
    super().__init__(seed=seed)
    self.n_samples_per_factors = int(n_samples_per_factors)
    self._cache = None

  @property
  def name(self):
    return "halfmoonsimage"

  @property
  def shape(self):
    return (64, 64, 3)

  @property
  def labels(self):
    return list(self.factor_names)

  def _all(self):
    if self._cache is None:
      self._cache = make_halfmoons(self.n_samples_per_factors,
                                   seed=self.seed)
    return self._cache

  def _load(self, partition: str):
    X, Y = self._all()
    n = len(X)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return X[sl].astype("float32") / 255.0, Y[sl]


class HalfMoons(ImageDataset):
  """2-D toy two-moons (reference ``toys.py:93``)."""

  def __init__(self, n_samples: int = 3200, noise: float = 0.05, seed: int = 1):
    super().__init__(seed=seed)
    from sklearn.datasets import make_moons
    x, y = make_moons(n_samples=n_samples, noise=noise, random_state=seed)
    self._x = x.astype("float32")
    self._y = y.astype("int64")

  @property
  def name(self):
    return "halfmoons"

  @property
  def shape(self):
    return (2,)

  @property
  def labels(self):
    return ["moon0", "moon1"]

  def normalize255(self, x):
    return np.asarray(x, "float32")

  def _load(self, partition: str):
    n = len(self._x)
    sl = get_partition(partition, train=slice(0, int(0.8 * n)),
                       valid=slice(int(0.8 * n), int(0.9 * n)),
                       test=slice(int(0.9 * n), n))
    return self._x[sl], self._y[sl]


class YDisentanglement(ImageDataset):
  """Synthetic disentanglement set (reference ``synthesize.py:9``): images
  of the letter Y with controlled rotation/scale/position factors."""

  factor_names = ["rotation", "scale", "pos_x", "pos_y"]
  factor_sizes = [16, 8, 16, 16]

  def __init__(self, n_samples: int = 4096, image_size: int = 32,
               seed: int = 1):
    super().__init__(seed=seed)
    self.n_samples = int(n_samples)
    self.image_size = int(image_size)
    self._cache = {}

  @property
  def name(self):
    return "ydisentanglement"

  @property
  def shape(self):
    return (self.image_size, self.image_size, 1)

  @property
  def labels(self):
    return list(self.factor_names)

  def render(self, factors):
    f = np.asarray(factors)
    n = len(f)
    s = self.image_size
    rot = f[:, 0] / self.factor_sizes[0] * 2 * np.pi
    scale = 0.2 + 0.5 * f[:, 1] / max(self.factor_sizes[1] - 1, 1)
    px = 0.25 + 0.5 * f[:, 2] / max(self.factor_sizes[2] - 1, 1)
    py = 0.25 + 0.5 * f[:, 3] / max(self.factor_sizes[3] - 1, 1)
    yy, xx = np.mgrid[0:s, 0:s].astype("f") / (s - 1)
    dx = xx[None] - px[:, None, None]
    dy = yy[None] - py[:, None, None]
    c, si = np.cos(rot)[:, None, None], np.sin(rot)[:, None, None]
    u = (c * dx + si * dy) / scale[:, None, None]
    v = (-si * dx + c * dy) / scale[:, None, None]
    w = 0.18
    stem = (np.abs(u) < w) & (v > 0) & (v < 1.0)
    arm1 = (np.abs(u - 0.5 * -v) < w) & (v <= 0) & (v > -1.0)
    arm2 = (np.abs(u - 0.5 * v) < w) & (v <= 0) & (v > -1.0)
    img = (stem | arm1 | arm2).astype("float32")[..., None]
    return img

  def _load(self, partition: str):
    key = get_partition(partition, train=0, valid=1, test=2)
    if key not in self._cache:
      rng = np.random.RandomState(self.seed + 31 * key)
      f = np.stack([rng.randint(0, k, self.n_samples)
                    for k in self.factor_sizes], -1)
      self._cache[key] = (self.render(f), f.astype("float32"))
    return self._cache[key]


class LegoFaces(NPZImageDataset):
  """LEGO minifigure faces with description-derived factor labels
  (reference ``image_data/lego_faces.py:287``).  The reference scrapes
  images from the web (:53); with no egress this loads the scraped +
  resized ``{x, y}`` npz cache, keeping the multi-hot factor labels."""
  _name = "legofaces"
  _shape = (64, 64, 3)
  _labels = ["eyebrows", "eyes", "glasses", "smile", "frown", "open_mouth",
             "teeth", "beard", "moustache", "lipstick", "angry", "scared",
             "happy", "sad", "curly"]


class Kaokore(NPZImageDataset):
  """Pre-modern Japanese face artworks (reference ``image_data/kaokore.py``),
  npz-gated with gender/status labels."""
  _name = "kaokore"
  _shape = (64, 64, 3)
  _labels = ["male", "female", "noble", "warrior", "incarnation", "commoner"]
