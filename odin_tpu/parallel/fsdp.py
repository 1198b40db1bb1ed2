"""Fully-sharded data parallelism (ZeRO-3 layout via GSPMD).

No counterpart in the single-device reference (SURVEY.md §2.1).  TPU-native
design: every parameter leaf (and its mirrored optimizer moments) is
sharded along the data axis on its largest evenly-divisible dimension, so
per-device parameter + optimizer memory drops ~mesh_size-fold; GSPMD
inserts the all-gathers to materialize each weight for its op and
reduce-scatters the gradients — the standard scaling-book FSDP recipe
(weights sharded at rest, gathered just-in-time).  Correctness does not
depend on the layout: `test_fsdp_step_matches_replicated` checks the FSDP
step equals the replicated step to fp32 tolerance.

Small leaves (< `min_size` elements) and leaves with no divisible dim stay
replicated — gathering a bias costs more than it saves.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_shardings", "shard_params_fsdp", "shard_state_fsdp",
           "fsdp_tp_shardings", "shard_state_fsdp_tp"]


def _leaf_spec(leaf, n: int, axis: str, min_size: int):
  shape = np.shape(leaf)
  if int(np.prod(shape, dtype=np.int64)) < min_size:
    return P()
  # largest dim evenly divisible by the axis size wins
  best, best_dim = -1, None
  for d, s in enumerate(shape):
    if s % n == 0 and s > best:
      best, best_dim = s, d
  if best_dim is None:
    return P()
  spec = [None] * len(shape)
  spec[best_dim] = axis
  return P(*spec)


def fsdp_shardings(params: Any, mesh: Mesh, axis: str = "data",
                   min_size: int = 1024) -> Any:
  """Pytree of NamedShardings implementing the FSDP layout."""
  n = mesh.shape[axis]
  return jax.tree_util.tree_map(
      lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n, axis, min_size)),
      params)


def shard_params_fsdp(params: Any, mesh: Mesh, axis: str = "data",
                      min_size: int = 1024) -> Any:
  """device_put every param leaf in its FSDP layout."""
  return jax.tree_util.tree_map(
      jax.device_put, params, fsdp_shardings(params, mesh, axis, min_size))


def fsdp_tp_shardings(params: Any, mesh: Mesh,
                      rules, data_axis: str = "data",
                      model_axis: str = "model",
                      min_size: int = 1024) -> Any:
  """COMPOSED layout on a 2-D ('data', 'model') mesh: each leaf first gets
  its tensor-parallel spec from the megatron-style `rules`
  (`tensor_parallel.param_shardings`), then the FSDP 'data' axis is added
  on the largest evenly-divisible dim the TP spec left unsharded.  This is
  the standard production stack (scaling-book: TP inside the fast axis,
  ZeRO/FSDP across the outer axis) — weights at rest are sharded over ALL
  devices, GSPMD gathers along 'data' just-in-time and keeps the TP
  collectives on 'model'.  Correctness does not depend on the layout:
  `tests/test_parallel.py::test_fsdp_tp_composed_matches_replicated` holds
  the composed step equal to the replicated step."""
  from odin_tpu.parallel.tensor_parallel import param_shardings
  # the TP axis name comes from `rules`; a mismatched model_axis argument
  # would otherwise be silently ignored (ADVICE r3)
  rule_axes = {a for _, spec in rules for a in spec if a is not None}
  if rule_axes and model_axis not in rule_axes:
    raise ValueError(
        f"model_axis={model_axis!r} does not appear in the rules' specs "
        f"(rules shard over {sorted(rule_axes)}); pass rules built with "
        f"megatron_rules(axis=model_axis)")
  tp = param_shardings(params, mesh, rules)
  n = mesh.shape[data_axis]

  def _compose(leaf, tp_sharding):
    spec = list(tp_sharding.spec)
    spec += [None] * (np.ndim(leaf) - len(spec))
    shape = np.shape(leaf)
    if int(np.prod(shape, dtype=np.int64)) >= min_size:
      best, best_dim = -1, None
      for d, s in enumerate(shape):
        # a dim already sharded by TP holds s/n_model elements per device;
        # only unsharded dims are candidates for the data axis
        if spec[d] is None and s % n == 0 and s > best:
          best, best_dim = s, d
      if best_dim is not None:
        spec[best_dim] = data_axis
    return NamedSharding(mesh, P(*spec))

  return jax.tree_util.tree_map(_compose, params, tp)


def shard_state_fsdp_tp(state: Any, mesh: Mesh, rules,
                        data_axis: str = "data", model_axis: str = "model",
                        min_size: int = 1024) -> Any:
  """FSDP x TP shard a TrainState: params AND optimizer moments get the
  composed layout (moments mirror param shapes leaf-for-leaf)."""
  host = jax.device_get(state)

  def _put(tree):
    return jax.tree_util.tree_map(
        jax.device_put, tree,
        fsdp_tp_shardings(tree, mesh, rules, data_axis, model_axis,
                          min_size))

  return host.replace(
      params=_put(host.params),
      opt_states=_put(host.opt_states),
      step=jax.device_put(host.step),
      rng=jax.device_put(host.rng),
      mutables=jax.tree_util.tree_map(jax.device_put, host.mutables),
      skipped_updates=jax.device_put(host.skipped_updates),
  )


def shard_state_fsdp(state: Any, mesh: Mesh, axis: str = "data",
                     min_size: int = 1024) -> Any:
  """FSDP-shard a TrainState: params AND optimizer moments (the moments
  mirror the param shapes leaf-for-leaf, so the same per-leaf rule gives
  them matching layouts — that is what makes this ZeRO-3, not ZeRO-1)."""
  host = jax.device_get(state)
  return host.replace(
      params=shard_params_fsdp(host.params, mesh, axis, min_size),
      opt_states=shard_params_fsdp(host.opt_states, mesh, axis, min_size),
      step=jax.device_put(host.step),
      rng=jax.device_put(host.rng),
      mutables=jax.tree_util.tree_map(jax.device_put, host.mutables),
      skipped_updates=jax.device_put(host.skipped_updates),
  )
