"""Tensor-parallel parameter sharding rules.

No counterpart in the single-device reference (SURVEY.md §2.1: in-graph
multi-device is absent there).  TPU-native design: parameters are laid out
over the mesh with `NamedSharding` rules matched against param paths; GSPMD
then inserts the all-gathers/reduce-scatters.  Megatron-style layout for
MLPs: first (up) Dense kernel sharded on its OUTPUT axis, second (down)
Dense kernel on its INPUT axis, so the pair needs a single psum.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_params_by_rules", "megatron_rules", "param_shardings"]


def param_shardings(params: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, Tuple]]) -> Any:
  """Pytree of NamedShardings: first regex (against the '/'-joined param
  path) that matches wins; default = fully replicated."""
  flat = jax.tree_util.tree_flatten_with_path(params)[0]

  def _spec_for(path, leaf):
    name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)
    for pattern, spec in rules:
      if re.search(pattern, name):
        spec = tuple(spec)
        if len(spec) < leaf.ndim:  # right-align the spec on trailing dims
          spec = (None,) * (leaf.ndim - len(spec)) + spec
        return NamedSharding(mesh, P(*spec[:leaf.ndim]))
    return NamedSharding(mesh, P())

  leaves = {tuple(p): _spec_for(p, l) for p, l in flat}
  treedef = jax.tree_util.tree_structure(params)
  return jax.tree_util.tree_unflatten(
      treedef, [leaves[tuple(p)] for p, _ in flat])


def shard_params_by_rules(params: Any, mesh: Mesh,
                          rules: Sequence[Tuple[str, Tuple]]) -> Any:
  """device_put every param according to the rules."""
  shardings = param_shardings(params, mesh, rules)
  return jax.tree_util.tree_map(jax.device_put, params, shardings)


def megatron_rules(axis: str = "model") -> List[Tuple[str, Tuple]]:
  """Column-parallel encoder/up projections, row-parallel decoder/down
  projections, for both Dense and Conv kernels.

  Dense kernels are (in, out); Conv/ConvTranspose kernels are
  (kh, kw, in_ch, out_ch).  Encoder side shards the OUTPUT features
  (column-parallel), decoder side the INPUT features (row-parallel), so each
  up/down pair costs one psum — GSPMD inserts the collectives from the
  layouts.  Correctness does not depend on the layout (tested:
  `test_dp_tp_step_matches_replicated`); the rules only pick the
  communication pattern."""
  return [
      # latent / head projections: shard the wide output axis
      (r"latents/projection/kernel", (None, axis)),
      (r"encoder/.*Conv.*/kernel", (None, None, None, axis)),
      (r"encoder/.*Dense.*/kernel", (None, axis)),
      # decoder consumes sharded features: row-parallel input axis
      (r"decoder/.*Conv.*/kernel", (None, None, axis, None)),
      (r"decoder/.*Dense.*/kernel", (axis, None)),
  ]
