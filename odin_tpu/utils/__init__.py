"""Generic utilities (reference: ``odin/utils/__init__.py``).

Only the pieces the rest of the framework actually needs are kept; the
reference's 5.7k-LoC grab-bag (Progbar, ArgController, crypto, caching, ...)
maps onto a much smaller surface here because tqdm/hashlib/functools cover it.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import time
from typing import Any, Callable, Iterable, Iterator, List, Optional, Sequence, Union

import numpy as np

__all__ = [
    "as_tuple",
    "save_wav",
    "minibatch",
    "md5_checksum",
    "UnitTimer",
    "get_cache_path",
    "get_data_path",
    "get_exp_path",
    "get_datasetpath",
    "get_exppath",
    "one_hot",
    "cache_disk",
    "cache_memory",
    "get_system_status",
    "get_process_status",
    "Progbar",
    "ArgController",
    "stdio",
]


def as_tuple(x: Any, N: Optional[int] = None, t: Optional[type] = None) -> tuple:
  """Coerce `x` into a tuple, optionally repeated to length `N` and cast to `t`.

  Mirrors the semantics of the reference's `as_tuple`
  (``odin/utils/__init__.py``): scalars are repeated; sequences of length 1
  are broadcast to N; length mismatches raise.
  """
  if isinstance(x, (list, tuple, np.ndarray)) and not isinstance(x, str):
    x = tuple(x)
  else:
    x = (x,)
  if N is not None:
    if len(x) == 1:
      x = x * int(N)
    elif len(x) != N:
      raise ValueError(f"expected {N} values but got {len(x)}: {x}")
  if t is not None:
    x = tuple(t(i) for i in x)
  return x


def minibatch(batch_size: int,
              n: Optional[int] = None,
              *arrays,
              seed: Optional[int] = None,
              shuffle: bool = False) -> Iterator:
  """Yield (start, end) index pairs — or array slices — of size `batch_size`.

  Reference: ``odin/utils/__init__.py:191`` (`minibatch`).
  """
  if len(arrays) > 0 and n is None:
    n = len(arrays[0])
  assert n is not None, "either n or arrays must be given"
  indices = None
  if shuffle:
    rng = np.random.RandomState(seed)
    indices = rng.permutation(n)
  for start in range(0, n, batch_size):
    end = min(start + batch_size, n)
    if len(arrays) == 0:
      if indices is None:
        yield start, end
      else:
        yield indices[start:end]
    else:
      if indices is None:
        yield tuple(a[start:end] for a in arrays) if len(arrays) > 1 else arrays[0][start:end]
      else:
        idx = indices[start:end]
        yield tuple(a[idx] for a in arrays) if len(arrays) > 1 else arrays[0][idx]


def md5_checksum(obj: Any) -> str:
  """md5 of a file path, bytes, ndarray, or arbitrary picklable object.

  Reference: ``odin/utils/crypto.py:117``.
  """
  md5 = hashlib.md5()
  if isinstance(obj, str) and os.path.isfile(obj):
    with open(obj, "rb") as f:
      for chunk in iter(lambda: f.read(1 << 20), b""):
        md5.update(chunk)
  elif isinstance(obj, bytes):
    md5.update(obj)
  elif isinstance(obj, np.ndarray):
    md5.update(np.ascontiguousarray(obj).tobytes())
  else:
    md5.update(pickle.dumps(obj))
  return md5.hexdigest()


class UnitTimer:
  """Context-manager timer (reference: ``odin/utils/__init__.py:127``)."""

  def __init__(self, name: str = "", verbose: bool = True):
    self.name = name
    self.verbose = verbose
    self.duration = 0.0

  def __enter__(self):
    self._start = time.perf_counter()
    return self

  def __exit__(self, *exc):
    self.duration = time.perf_counter() - self._start
    if self.verbose:
      print(f"[timer]{' ' + self.name if self.name else ''}: {self.duration:.4f}s")
    return False


def _managed_path(kind: str) -> str:
  base = os.environ.get("ODIN_TPU_HOME", os.path.join(os.path.expanduser("~"), ".odin_tpu"))
  path = os.path.join(base, kind)
  os.makedirs(path, exist_ok=True)
  return path


def get_cache_path() -> str:
  """Managed cache dir (reference: ``odin/utils/__init__.py:1170-1276``)."""
  return _managed_path("cache")


def get_data_path() -> str:
  return _managed_path("datasets")


def get_exp_path() -> str:
  return _managed_path("experiments")


def one_hot(y: np.ndarray, num_classes: Optional[int] = None, dtype="float32") -> np.ndarray:
  """Dense one-hot encoding (reference: ``odin/preprocessing/signal.py:1140``)."""
  y = np.asarray(y, dtype="int64").ravel()
  if num_classes is None:
    num_classes = int(y.max()) + 1
  out = np.zeros((len(y), num_classes), dtype=dtype)
  out[np.arange(len(y)), y] = 1.0
  return out


# reference-name aliases (``odin/utils/__init__.py:1170-1276``)
def get_datasetpath(*a, **kw) -> str:
  return get_data_path()


def get_exppath(*a, **kw) -> str:
  return get_exp_path()


def cache_memory(fn: Callable) -> Callable:
  """In-process memoization keyed by the md5 of the arguments
  (reference ``odin/utils/cache_utils.py:66``)."""
  import functools
  _store = {}

  @functools.wraps(fn)
  def wrapped(*args, **kwargs):
    key = md5_checksum((args, tuple(sorted(kwargs.items()))))
    if key not in _store:
      _store[key] = fn(*args, **kwargs)
    return _store[key]

  wrapped.cache_clear = _store.clear
  return wrapped


def get_system_status(scale_factor: float = 1.0) -> dict:
  """Host memory/CPU snapshot (reference ``odin/utils/__init__.py:1433``);
  psutil-gated with an os-level fallback."""
  try:
    import psutil
    vm = psutil.virtual_memory()
    return {"cpu_count": psutil.cpu_count(),
            "cpu_percent": psutil.cpu_percent(),
            "memory_total": vm.total * scale_factor,
            "memory_available": vm.available * scale_factor,
            "memory_percent": vm.percent}
  except ImportError:
    return {"cpu_count": os.cpu_count(), "cpu_percent": None,
            "memory_total": None, "memory_available": None,
            "memory_percent": None}


def get_process_status(pid: Optional[int] = None) -> dict:
  """Per-process rss/cpu snapshot (reference ``utils/__init__.py:1456``)."""
  try:
    import psutil
    p = psutil.Process(pid)
    return {"pid": p.pid, "rss": p.memory_info().rss,
            "cpu_percent": p.cpu_percent(), "threads": p.num_threads()}
  except ImportError:
    return {"pid": pid or os.getpid(), "rss": None, "cpu_percent": None,
            "threads": None}


def cache_disk(fn: Callable) -> Callable:
  """Disk-memoize `fn` keyed by the md5 of its arguments.

  Reference: ``odin/utils/cache_utils.py:124`` (`cache_disk`).
  """
  import functools

  @functools.wraps(fn)
  def wrapped(*args, **kwargs):
    key = md5_checksum((fn.__module__, fn.__qualname__, args, tuple(sorted(kwargs.items()))))
    path = os.path.join(get_cache_path(), f"{fn.__name__}_{key}.pkl")
    if os.path.exists(path):
      with open(path, "rb") as f:
        return pickle.load(f)
    out = fn(*args, **kwargs)
    with open(path, "wb") as f:
      pickle.dump(out, f)
    return out

  return wrapped


# re-exports of the reference's headline utilities living in submodules
from odin_tpu.utils.progbar import Progbar  # noqa: E402
from odin_tpu.utils.cli import ArgController, stdio  # noqa: E402
from odin_tpu.utils.mpi import MPI, SharedCounter, async_process, async_thread  # noqa: E402


def flatten_list(seq, level=None):
  """Flatten nested lists/tuples (reference ``utils`` `flatten_list`);
  `level` bounds the recursion depth (None = fully flat)."""
  out = []
  for item in seq:
    if isinstance(item, (list, tuple)) and (level is None or level > 0):
      out.extend(flatten_list(
          item, None if level is None else level - 1))
    else:
      out.append(item)
  return out


_ANSI = {"red": "\033[91m", "green": "\033[92m", "yellow": "\033[93m",
         "blue": "\033[94m", "magenta": "\033[95m", "cyan": "\033[96m",
         "lightred": "\033[91m", "lightgreen": "\033[92m"}


def ctext(text, color: str = "red") -> str:
  """ANSI-colored text (reference ``utils`` `ctext`); plain when the
  stream is not a tty."""
  import sys as _sys
  code = _ANSI.get(str(color).lower())
  if code is None or not getattr(_sys.stdout, "isatty", lambda: False)():
    return str(text)
  return f"{code}{text}\033[0m"


def eprint(*args, **kwargs):
  """print to stderr (reference ``utils`` `eprint`)."""
  import sys as _sys
  kwargs.setdefault("file", _sys.stderr)
  print(*args, **kwargs)


class MD5object:
  """Mixin: md5 of the object's picklable state
  (reference ``utils/crypto.py` `MD5object`)."""

  @property
  def md5_checksum(self) -> str:
    return md5_checksum(self.__dict__)


__all__ += ["MPI", "SharedCounter", "async_process", "async_thread",
            "flatten_list", "ctext", "eprint", "MD5object"]
from odin_tpu.utils.np_utils import (  # noqa: E402
    array2bytes,
    bytes2array,
    label_splitter,
    one_hot,
    unique_labels,
)
from odin_tpu.utils.ordered_flag import OrderedFlag  # noqa: E402
from odin_tpu.utils.decorators import (  # noqa: E402
    abstractstatic,
    autoattr,
    functionable,
    schedule,
    singleton,
    typecheck,
)
from odin_tpu.utils.pdf_utils import (  # noqa: E402
    get_pdf_text,
    get_pdf_titles,
    rename_pdf,
    sanitize_title,
)
from odin_tpu.utils.python_utils import (  # noqa: E402
    IndexedList,
    bidict,
    defaultdictkey,
    fifodict,
    get_formatted_datetime,
    get_function_arguments,
    is_bool,
    is_lambda,
    is_number,
    is_path,
    is_pickleable,
    is_primitive,
    is_string,
    multikeysdict,
    partialclass,
    struct,
)


def save_wav(path, s, fs):
  """Reference ``utils/__init__.py:1379``; delegates to the stdlib-based
  PCM16 writer in `preprocessing.speech.save_wave`."""
  from odin_tpu.preprocessing.speech import save_wave
  return save_wave(path, s, fs)
