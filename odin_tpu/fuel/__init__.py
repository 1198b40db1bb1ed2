"""Data layer (reference: ``odin/fuel``)."""
import inspect
from typing import List, Type, Union

from odin_tpu.fuel.bio_data import (
    PBMC,
    BreastTumor,
    Cortex,
    Forebrain,
    GeneDataset,
    HumanEmbryos,
    HumanGenome,
    Insilico,
    Leukemia,
    Melanoma,
    SyntheticATAC,
    SyntheticGenes,
)
from odin_tpu.fuel.databases import (
    MmapArray,
    MmapArrayWriter,
    MmapDict,
    SQLiteDict,
    TableDict,
)
from odin_tpu.fuel.dataset import Dataset
from odin_tpu.fuel.dataset_base import IterableDataset, get_partition
from odin_tpu.fuel.image_data._base import ImageDataset
from odin_tpu.fuel.image_data.datasets import (
    CIFAR10,
    CIFAR20,
    CIFAR100,
    MNIST,
    SVHN,
    BinarizedAlphaDigits,
    BinarizedMNIST,
    CelebA,
    CelebABig,
    CelebASmall,
    FashionMNIST,
    HalfMNIST,
    HalfMoons,
    HalfMoonsImage,
    Kaokore,
    LegoFaces,
    Omniglot,
    Shapes3D,
    Shapes3D0,
    Shapes3DSmall,
    YDisentanglement,
    dSprites,
    dSprites0,
    dSpritesSmall,
)
from odin_tpu.fuel.audio_data import AudioFeatureLoader
from odin_tpu.fuel.nlp_data import (
    ImdbReview,
    MathArithmetic,
    Newsgroup5,
    Newsgroup20_clean,
    Newsgroup20,
    NLPDataset,
    SyntheticBoW,
    TinyShakespear,
)
from odin_tpu.fuel.pipeline import DataPipeline

__all__ = [
    "get_dataset", "get_all_dataset", "IterableDataset", "ImageDataset",
    "DataPipeline", "Dataset", "MmapDict", "SQLiteDict", "MmapArray",
    "MmapArrayWriter", "MNIST", "FashionMNIST", "BinarizedMNIST",
    "HalfMNIST", "BinarizedAlphaDigits", "SVHN",
    "CIFAR10", "CIFAR100", "CIFAR20", "CelebA", "CelebASmall", "CelebABig",
    "Omniglot", "dSprites", "dSpritesSmall", "dSprites0", "Shapes3D",
    "Shapes3DSmall", "Shapes3D0", "HalfMoons", "HalfMoonsImage",
    "YDisentanglement", "Newsgroup20", "Newsgroup5", "Newsgroup20_clean", "SyntheticBoW",
    "Cortex", "PBMC", "SyntheticGenes", "GeneDataset", "NLPDataset",
    "Melanoma", "Forebrain", "Insilico", "BreastTumor", "Leukemia",
    "HumanEmbryos", "SyntheticATAC", "LegoFaces", "Kaokore",
    "ImdbReview", "TinyShakespear", "MathArithmetic", "AudioFeatureLoader",
]


def get_all_dataset(data_type: str = None) -> List[Type[IterableDataset]]:
  """All registered dataset classes, optionally filtered by data_type
  (reference ``fuel/__init__.py:12-42``)."""
  out = []
  for v in globals().values():
    if inspect.isclass(v) and issubclass(v, IterableDataset) and \
        v not in (IterableDataset, ImageDataset, GeneDataset, NLPDataset):
      if data_type is None:
        out.append(v)
      else:
        try:
          if v.data_type.fget(v) == data_type:  # property on class
            out.append(v)
        except Exception:
          pass
  return sorted(set(out), key=lambda c: c.__name__)


def get_dataset(name: Union[str, IterableDataset], **kwargs) -> IterableDataset:
  """Instantiate a dataset by name (reference ``fuel/__init__.py:12``)."""
  if isinstance(name, IterableDataset):
    return name
  key = str(name).lower().replace("_", "").strip()
  for cls in get_all_dataset():
    if cls.__name__.lower() == key:
      return cls(**kwargs)
  # fall back to the instance 'name' property where it differs
  for cls in get_all_dataset():
    try:
      if cls(**kwargs).name == key:
        return cls(**kwargs)
    except Exception:
      continue
  raise ValueError(f"cannot find dataset '{name}'; available: "
                   f"{[c.__name__ for c in get_all_dataset()]}")
