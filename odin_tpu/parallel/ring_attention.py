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


def _block_fold(q, k_blk, v_blk, m, l, o, scale, mask=None):
  """Fold one K/V block into the online-softmax state.

  q: (B, Tq, H, D); k_blk/v_blk: (B, Tk, H, D);
  m, l: (B, H, Tq); o: (B, Tq, H, D); mask: (Tq, Tk) True = attend.
  """
  s = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk) * scale      # (B, H, Tq, Tk)
  if mask is not None:
    s = jnp.where(mask[None, None], s, -jnp.inf)
  m_new = jnp.maximum(m, jnp.max(s, axis=-1))
  # rows with no visible key yet keep m = -inf; exp(-inf - -inf) guards
  m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
  corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
  p = jnp.exp(s - m_safe[..., None])
  if mask is not None:
    p = jnp.where(mask[None, None], p, 0.0)
  l_new = l * corr + jnp.sum(p, axis=-1)
  pv = jnp.einsum("bhqk,bkhd->bqhd", p, v_blk)
  o_new = o * corr.transpose(0, 2, 1)[..., None] + pv
  return m_new, l_new, o_new


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "seq",
                   scale: Optional[float] = None,
                   causal: bool = False) -> jnp.ndarray:
  """Exact multi-head attention with Q/K/V sharded on the sequence axis.

  Args:
    q, k, v: (B, T, H, D) with T sharded over `axis` (T % n_devices == 0).
    mesh: mesh containing `axis`.
    scale: score scale; default 1/sqrt(D).
    causal: mask keys after each query's global position.  The visiting
      block's global offset is derived from the device's ring index and the
      rotation step, so the mask is exact across shard boundaries.

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
    my = jax.lax.axis_index(axis)

    def body(carry, step):
      k_blk, v_blk, m, l, o = carry
      mask = None
      if causal:
        # after `step` rotations this device holds the block that ORIGINATED
        # at ring position (my - step) mod n
        src = jnp.mod(my - step, n)
        q_pos = my * Tq + jnp.arange(Tq)
        k_pos = src * k_blk.shape[1] + jnp.arange(k_blk.shape[1])
        mask = q_pos[:, None] >= k_pos[None, :]
      m, l, o = _block_fold(q, k_blk, v_blk, m, l, o, scale, mask)
      k_blk = jax.lax.ppermute(k_blk, axis, perm)
      v_blk = jax.lax.ppermute(v_blk, axis, perm)
      return (k_blk, v_blk, m, l, o), None

    (k_fin, v_fin, m, l, o), _ = jax.lax.scan(
        body, (k, v, m0, l0, o0), jnp.arange(n))
    del k_fin, v_fin
    return o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]

  spec = P(None, axis, None, None)
  fn = shard_map(_local, mesh=mesh, in_specs=(spec, spec, spec),
                 out_specs=spec, check_vma=False)
  return fn(q, k, v)


def full_attention_reference(q, k, v, scale: Optional[float] = None,
                             causal: bool = False):
  """Unsharded softmax attention for exactness tests."""
  if scale is None:
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
  s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
  if causal:
    T = q.shape[1]
    mask = jnp.arange(T)[:, None] >= jnp.arange(T)[None, :]
    s = jnp.where(mask[None, None], s, -jnp.inf)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum("bhqk,bkhd->bqhd", p, v)
