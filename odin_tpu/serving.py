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

__all__ = ["export_fn", "load_fn", "export_vae", "ServingBundle",
           "quantize_params", "dequantize_params"]

_Q_KEY = "__int8__"


def quantize_params(params, min_size: int = 1024):
  """Weight-only symmetric int8 quantization of a param pytree.

  Float leaves with >= `min_size` elements become
  ``{'__int8__': int8 codes, 'scale': fp32 per-output-channel scales}``
  (channel = last axis: Dense kernels are (in, out), conv kernels HWIO).
  Small leaves (biases, norm scales) stay fp32 — they are a rounding-error
  fraction of the bytes but carry disproportionate accuracy.

  Serving rationale (TPU): weights are read from HBM every step while being
  used once per matmul — int8 storage cuts that traffic (and the exported
  artifact) 4x; the dequantize (one multiply per tile) fuses into the
  consumer.  bf16 activations are unaffected.  No counterpart in the
  reference (no serving layer, SURVEY.md §1).
  """

  def q(leaf):
    if (hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
        and leaf.size >= min_size and leaf.ndim >= 1):
      w = np.asarray(leaf, np.float32)
      scale = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)),
                     keepdims=True) / 127.0
      scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
      codes = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
      return {_Q_KEY: codes, "scale": scale}
    return leaf

  return jax.tree_util.tree_map(q, params)


def dequantize_params(qparams):
  """Inverse of `quantize_params`; a no-op on unquantized leaves.  Safe to
  call inside jit — the dequant multiply fuses into the consuming matmul."""

  def is_q(x):
    return isinstance(x, dict) and _Q_KEY in x

  def dq(leaf):
    if is_q(leaf):
      return leaf[_Q_KEY].astype(jnp.float32) * leaf["scale"]
    return leaf

  return jax.tree_util.tree_map(dq, qparams, is_leaf=is_q)


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
          batch_polymorphic: bool = True,
          weights: Optional[Sequence[np.ndarray]] = None,
          **meta) -> "ServingBundle":
    """Export `fn(*example_args, *weights)`.  `weights` (if given) are
    stored in a sidecar ``<name>.weights.npz`` and appended automatically
    at call time — this is how quantized weights stay int8 in the artifact
    (a closure-captured numpy constant would be constant-folded to fp32
    during tracing)."""
    nbytes = 0
    if weights is not None:
      weights = [np.asarray(w) for w in weights]
      wpath = os.path.join(self.path, f"{name}.weights.npz")
      np.savez(wpath, **{f"w{i:05d}": w for i, w in enumerate(weights)})
      nbytes += os.path.getsize(wpath)
      example_args = tuple(example_args) + tuple(weights)
    blob = export_fn(fn, example_args, batch_polymorphic=batch_polymorphic)
    with open(os.path.join(self.path, f"{name}.stablehlo"), "wb") as f:
      f.write(blob)
    self.manifest[name] = dict(bytes=len(blob) + nbytes,
                               has_weights=weights is not None, **meta)
    json.dump(self.manifest, open(self._manifest_path, "w"), indent=1)
    return self

  def __getitem__(self, name: str) -> Callable:
    if name not in self._fns:
      with open(os.path.join(self.path, f"{name}.stablehlo"), "rb") as f:
        fn = load_fn(f.read())
      wpath = os.path.join(self.path, f"{name}.weights.npz")
      if os.path.exists(wpath):
        with np.load(wpath) as zf:
          ws = [jnp.asarray(zf[k]) for k in sorted(zf.files)]
        inner = fn
        fn = lambda *args, _inner=inner, _ws=ws: _inner(*args, *_ws)
      self._fns[name] = fn
    return self._fns[name]

  def names(self):
    return sorted(self.manifest)


def export_vae(vae, path: str, example_batch: int = 1,
               quantize: bool = False) -> ServingBundle:
  """Export a trained VAE's serving surface: `encode_mean` (x -> E[z|x]),
  `reconstruct` (x -> E[x|E[z|x]]), `decode_mean` (z -> E[x|z]).

  Without `quantize`, weights are CAPTURED inside the artifacts
  (constants), so serving needs only jax — no odin_tpu, no flax, no model
  class.  With `quantize`, large weight tensors are stored as int8 codes +
  per-channel scales (`quantize_params`) in a ``.weights.npz`` sidecar and
  passed as runtime arguments (a numpy closure constant would be
  constant-folded to fp32 at trace time), dequantized on-chip — ~4x
  smaller bundles at a typically negligible accuracy cost
  (tests/test_serving.py asserts the reconstruction delta).
  """
  raw = jax.device_get(vae._params_of())
  x = jnp.zeros((example_batch,) + tuple(vae.input_shape), jnp.float32)
  z = jnp.zeros((example_batch, vae.zdim), jnp.float32)
  rng = jax.random.PRNGKey(0)

  if quantize:
    leaves, treedef = jax.tree_util.tree_flatten(quantize_params(raw))

    def params_of(ws):
      return dequantize_params(jax.tree_util.tree_unflatten(treedef,
                                                            list(ws)))
  else:
    leaves = []

    def params_of(ws):
      return raw

  def encode_mean(x, *ws):
    return vae._apply(params_of(ws), "encode", x, rng=rng).mean()

  def decode_mean(z, *ws):
    return vae._apply(params_of(ws), "decode", z, rng=rng).mean()

  def reconstruct(x, *ws):
    p = params_of(ws)
    qz = vae._apply(p, "encode", x, rng=rng)
    return vae._apply(p, "decode", qz.mean(), rng=rng).mean()

  weights = leaves if quantize else None
  bundle = ServingBundle(path)
  bundle.add("encode_mean", encode_mean, (x,), weights=weights,
             input_shape=list(vae.input_shape), zdim=vae.zdim)
  bundle.add("decode_mean", decode_mean, (z,), weights=weights,
             zdim=vae.zdim)
  bundle.add("reconstruct", reconstruct, (x,), weights=weights,
             input_shape=list(vae.input_shape))
  return bundle
