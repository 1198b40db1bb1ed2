"""Pipeline parallelism (GPipe-style) over a ``stage`` mesh axis.

The reference has NO in-graph multi-device execution (SURVEY §2.1: "DP/TP/
PP ... none exist"); this module is new capability, built the TPU way: each
device in the ``stage`` axis holds ONE stage's parameters, microbatches
rotate through the stages via ``ppermute`` over ICI, and the whole
(M + S - 1)-tick schedule is a single ``lax.scan`` inside one ``shard_map``
— one compiled program, no host round-trips.  The schedule is the standard
GPipe fill-drain: device s computes microbatch (t - s) at tick t, the
S - 1 bubble ticks compute on zeros and are masked out of the result.

Differentiable end-to-end: ``ppermute``'s transpose is the reverse
``ppermute``, so ``jax.grad`` of a pipelined loss yields exact per-stage
parameter gradients (verified against the sequential reference in
``tests/test_parallel.py``).

Constraints (the honest ones for a rotate-buffer pipeline): every stage
maps activations of one fixed shape to the same shape, and all stages share
one parameter structure (stack per-stage params on a leading axis with
`stack_stage_params`).
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
  from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = [
    "stack_stage_params",
    "split_microbatches",
    "merge_microbatches",
    "pipeline_apply",
]


def stack_stage_params(params_list: Sequence[Any]):
  """Stack S per-stage parameter pytrees (identical structure) on a new
  leading 'stage' axis, ready for `pipeline_apply`."""
  return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def split_microbatches(x: jnp.ndarray, n_microbatches: int) -> jnp.ndarray:
  """(B, ...) -> (M, B/M, ...); B must divide evenly."""
  B = x.shape[0]
  if B % n_microbatches:
    raise ValueError(f"batch {B} not divisible by M={n_microbatches}")
  return x.reshape((n_microbatches, B // n_microbatches) + x.shape[1:])


def merge_microbatches(x: jnp.ndarray) -> jnp.ndarray:
  return x.reshape((-1,) + x.shape[2:])


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any,
                   microbatches: jnp.ndarray,
                   mesh: Mesh,
                   axis: str = "stage") -> jnp.ndarray:
  """Run `microbatches` through S pipeline stages laid out on `axis`.

  Args:
    stage_fn: (stage_params, (b, ...) activation) -> (b, ...) activation;
      applied S times in sequence, once per device.
    stacked_params: pytree with leaves of shape (S, ...) — stage i uses
      leaf[i] (see `stack_stage_params`).
    microbatches: (M, b, ...) input microbatches (see `split_microbatches`).
    mesh: mesh whose `axis` has size S.

  Returns (M, b, ...) final-stage outputs, replicated across `axis`.
  """
  S = mesh.shape[axis]
  M = microbatches.shape[0]
  n_ticks = M + S - 1
  perm = [(i, i + 1) for i in range(S - 1)]

  def _local(params, xs):
    # params: leaves (1, ...) — this device's stage; xs: (M, b, ...) full
    p = jax.tree.map(lambda a: jnp.squeeze(a, 0), params)
    idx = jax.lax.axis_index(axis)
    zero = jnp.zeros(xs.shape[1:], xs.dtype)

    def tick(carry, t):
      act, outs = carry
      # rotate: stage i's activation moves to stage i+1 (stage 0 receives
      # zeros, it feeds from the input queue instead)
      recv = jax.lax.ppermute(act, axis, perm)
      feed = jnp.where(t < M, xs[jnp.clip(t, 0, M - 1)], zero)
      my_in = jnp.where(idx == 0, feed, recv)
      act = stage_fn(p, my_in)
      # the last stage finishes microbatch t-(S-1) at tick t
      out_t = t - (S - 1)
      upd = jax.lax.dynamic_update_index_in_dim(
          outs, act, jnp.clip(out_t, 0, M - 1), 0)
      write = jnp.logical_and(idx == S - 1,
                              jnp.logical_and(out_t >= 0, out_t < M))
      outs = jnp.where(write, upd, outs)
      return (act, outs), None

    outs0 = jnp.zeros_like(xs)
    (_, outs), _ = jax.lax.scan(tick, (zero, outs0), jnp.arange(n_ticks))
    # replicate the last stage's buffer to every device so the result is
    # unsharded (everyone else holds zeros)
    outs = jnp.where(idx == S - 1, outs, jnp.zeros_like(outs))
    return jax.lax.psum(outs, axis)

  spec_p = jax.tree.map(lambda _: P(axis), stacked_params)
  fn = shard_map(_local, mesh=mesh, in_specs=(spec_p, P()), out_specs=P(),
                 check_vma=False)
  return fn(stacked_params, microbatches)
