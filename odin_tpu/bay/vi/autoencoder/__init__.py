"""The VAE zoo + `get_vae` registry
(reference: ``odin/bay/vi/autoencoder/__init__.py:28``)."""
import inspect
from typing import Type, Union

from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VAE,
    Autoencoder,
    VAECore,
    VariationalAutoencoder,
)

__all__ = ["VariationalAutoencoder", "VAE", "Autoencoder", "get_vae",
           "get_all_vae"]


def _zoo():
  out = {}
  for k, v in globals().items():
    if inspect.isclass(v) and issubclass(v, VariationalAutoencoder):
      out[k.lower()] = v
  return out


def get_vae(name: Union[str, Type[VariationalAutoencoder]] = None):
  """Look up a VAE class by (case-insensitive) name; with no argument,
  return all classes (reference ``autoencoder/__init__.py:28``)."""
  if name is None:
    return sorted(set(_zoo().values()), key=lambda c: c.__name__)
  if inspect.isclass(name) and issubclass(name, VariationalAutoencoder):
    return name
  key = str(name).lower().replace("_", "")
  zoo = _zoo()
  if key in zoo:
    return zoo[key]
  # allow 'vae' suffix omission: get_vae('beta') -> BetaVAE
  if key + "vae" in zoo:
    return zoo[key + "vae"]
  raise ValueError(f"cannot find VAE with name '{name}'; "
                   f"available: {sorted(zoo)}")


def get_all_vae():
  return get_vae(None)
