"""Serving export: ahead-of-time compiled, serialized model functions.

No counterpart in the reference (it has no serving layer — SURVEY.md §1).
For production deployment the inference functions (encode / decode /
reconstruct, or any custom fn) are exported with ``jax.export`` to
versioned StableHLO artifacts: loadable in a process with NO model code,
runnable on any matching platform, with shape polymorphism on the batch
axis.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

__all__ = ["export_fn", "load_fn", "export_vae", "ServingBundle"]


def export_fn(fn: Callable, example_args: Sequence,
              batch_polymorphic: bool = True,
              poly_args: Sequence[int] = (0,)) -> bytes:
  """Serialize jit(fn) called on example_args to a StableHLO artifact.

  With `batch_polymorphic`, the leading axis of the arguments listed in
  `poly_args` (default: the first, i.e. the data batch) is symbolic ('b'),
  so one artifact serves every batch size; other args keep static shapes.
  """
  if batch_polymorphic:
    scope = jax_export.SymbolicScope()

    def poly(x):
      if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
        dims = ("b",) + tuple(str(d) for d in x.shape[1:])
        shape = jax_export.symbolic_shape(",".join(dims), scope=scope)
        return jax.ShapeDtypeStruct(shape, x.dtype)
      return x

    specs = tuple(
        jax.tree_util.tree_map(poly, a) if i in set(poly_args) else a
        for i, a in enumerate(example_args))
    exp = jax_export.export(jax.jit(fn))(*specs)
  else:
    exp = jax_export.export(jax.jit(fn))(*example_args)
  return exp.serialize()


def load_fn(blob: bytes) -> Callable:
  """Deserialize an exported function; returns a callable."""
  exp = jax_export.deserialize(blob)
  return exp.call


class ServingBundle:
  """Directory of exported functions + weights for model-code-free serving."""

  def __init__(self, path: str):
    self.path = path
    os.makedirs(path, exist_ok=True)
    self._fns: Dict[str, Callable] = {}
    self._manifest_path = os.path.join(path, "manifest.json")
    self.manifest: Dict[str, Any] = {}
    if os.path.exists(self._manifest_path):
      self.manifest = json.load(open(self._manifest_path))

  def add(self, name: str, fn: Callable, example_args: Sequence,
          batch_polymorphic: bool = True, **meta) -> "ServingBundle":
    blob = export_fn(fn, example_args, batch_polymorphic=batch_polymorphic)
    with open(os.path.join(self.path, f"{name}.stablehlo"), "wb") as f:
      f.write(blob)
    self.manifest[name] = dict(bytes=len(blob), **meta)
    json.dump(self.manifest, open(self._manifest_path, "w"), indent=1)
    return self

  def __getitem__(self, name: str) -> Callable:
    if name not in self._fns:
      with open(os.path.join(self.path, f"{name}.stablehlo"), "rb") as f:
        self._fns[name] = load_fn(f.read())
    return self._fns[name]

  def names(self):
    return sorted(self.manifest)


def export_vae(vae, path: str, example_batch: int = 1) -> ServingBundle:
  """Export a trained VAE's serving surface: `encode_mean` (x -> E[z|x]),
  `reconstruct` (x -> E[x|E[z|x]]), `decode_mean` (z -> E[x|z]).

  Weights are CAPTURED inside the artifacts (constants), so serving needs
  only jax — no odin_tpu, no flax, no model class.
  """
  params = jax.device_get(vae._params_of())
  x = jnp.zeros((example_batch,) + tuple(vae.input_shape), jnp.float32)
  z = jnp.zeros((example_batch, vae.zdim), jnp.float32)
  rng = jax.random.PRNGKey(0)

  def encode_mean(x):
    return vae._apply(params, "encode", x, rng=rng).mean()

  def decode_mean(z):
    return vae._apply(params, "decode", z, rng=rng).mean()

  def reconstruct(x):
    qz = vae._apply(params, "encode", x, rng=rng)
    return vae._apply(params, "decode", qz.mean(), rng=rng).mean()

  bundle = ServingBundle(path)
  bundle.add("encode_mean", encode_mean, (x,),
             input_shape=list(vae.input_shape), zdim=vae.zdim)
  bundle.add("decode_mean", decode_mean, (z,), zdim=vae.zdim)
  bundle.add("reconstruct", reconstruct, (x,),
             input_shape=list(vae.input_shape))
  return bundle
