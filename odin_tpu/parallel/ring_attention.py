"""Ring attention: exact attention over a sequence sharded across the mesh.

New capability (SURVEY §5: the reference never shards a sequence; ring /
blockwise attention is the TPU-native design for long-context scaling).
The sequence axis is sharded over a 'seq' mesh axis; each device holds its
Q, K, V block.  K/V blocks rotate around the ring via `ppermute` (ICI
neighbor traffic only) while every device folds each visiting block into an
online-softmax accumulator (running max / denominator / numerator — the
same recurrence as the Pallas flash kernel in ``ops/pallas_attention.py``,
here across devices instead of VMEM tiles).  After n_devices rotations the
result is EXACTLY full softmax attention over the whole sequence:
`tests/test_parallel.py::test_ring_attention_matches_full`.

Communication cost: (n-1) ppermutes of one K/V block each — bandwidth
optimal, overlappable with the block matmuls; memory per device is
O(T/n) for activations, never materializing the (T, T) score matrix.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
  from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["ring_attention", "full_attention_reference"]


def _block_fold(q, k_blk, v_blk, m, l, o, scale):
  """Fold one K/V block into the online-softmax state.

  q: (B, Tq, H, D); k_blk/v_blk: (B, Tk, H, D);
  m, l: (B, H, Tq); o: (B, Tq, H, D).
  """
  s = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk) * scale      # (B, H, Tq, Tk)
  m_new = jnp.maximum(m, jnp.max(s, axis=-1))
  corr = jnp.exp(m - m_new)                                 # (B, H, Tq)
  p = jnp.exp(s - m_new[..., None])                         # (B, H, Tq, Tk)
  l_new = l * corr + jnp.sum(p, axis=-1)
  pv = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk)
  o_new = o * corr.transpose(0, 2, 1)[..., None] + pv
  return m_new, l_new, o_new


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "seq",
                   scale: Optional[float] = None) -> jnp.ndarray:
  """Exact multi-head attention with Q/K/V sharded on the sequence axis.

  Args:
    q, k, v: (B, T, H, D) with T sharded over `axis` (T % n_devices == 0).
    mesh: mesh containing `axis`.
    scale: score scale; default 1/sqrt(D).

  Returns (B, T, H, D), sharded like q.
  """
  n = mesh.shape[axis]
  if scale is None:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
  perm = [(i, (i + 1) % n) for i in range(n)]  # ring: send to the right

  def _local(q, k, v):
    B, Tq, H, D = q.shape
    m0 = jnp.full((B, H, Tq), -jnp.inf, q.dtype)
    l0 = jnp.zeros((B, H, Tq), q.dtype)
    o0 = jnp.zeros_like(q)

    def body(carry, _):
      k_blk, v_blk, m, l, o = carry
      m, l, o = _block_fold(q, k_blk, v_blk, m, l, o, scale)
      k_blk = jax.lax.ppermute(k_blk, axis, perm)
      v_blk = jax.lax.ppermute(v_blk, axis, perm)
      return (k_blk, v_blk, m, l, o), None

    (k_fin, v_fin, m, l, o), _ = jax.lax.scan(
        body, (k, v, m0, l0, o0), None, length=n)
    del k_fin, v_fin
    return o / l.transpose(0, 2, 1)[..., None]

  spec = P(None, axis, None, None)
  fn = shard_map(_local, mesh=mesh, in_specs=(spec, spec, spec),
                 out_specs=spec, check_vma=False)
  return fn(q, k, v)


def full_attention_reference(q, k, v, scale: Optional[float] = None):
  """Unsharded softmax attention for exactness tests."""
  if scale is None:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
  s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum("bhqk,bkhd->bqhd", p, v)
