"""Model introspection helpers.

Reference: ``odin/backend/keras_helpers.py`` (`layer2text` pretty-printer).
For flax modules, `layer2text` renders the module tree with parameter
shapes/counts (flax's tabulate under the hood when inputs are given).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = ["layer2text", "count_params"]


def count_params(params: Any) -> int:
  return int(sum(np.prod(l.shape)
                 for l in jax.tree_util.tree_leaves(params)))


def layer2text(module_or_params: Any, sample_input=None, depth: int = 2) -> str:
  """Human-readable summary of a flax module (with a sample input) or a
  params pytree."""
  import flax.linen as nn
  if isinstance(module_or_params, nn.Module) and sample_input is not None:
    try:
      return module_or_params.tabulate(
          jax.random.PRNGKey(0), sample_input, depth=depth,
          console_kwargs={"width": 100})
    except Exception:
      pass
  params = module_or_params
  if hasattr(params, "state") and params.state is not None:  # model object
    params = params.state.params
  lines = []
  flat = jax.tree_util.tree_flatten_with_path(params)[0]
  for path, leaf in flat:
    name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)
    lines.append(f"{name:<60s} {str(leaf.shape):<18s} {leaf.dtype}")
  lines.append(f"total parameters: {count_params(params):,}")
  return "\n".join(lines)
