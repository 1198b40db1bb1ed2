"""Pallas TPU kernel: flash attention (tiled online-softmax attention).

The hot op of every attention model: ``softmax(Q K^T / sqrt(d)) V`` without
ever materializing the (Tq, Tk) score matrix in HBM.  The kernel streams
K/V tiles through VMEM, carrying the running row-max / row-sum / weighted
accumulator across key blocks (online softmax), so HBM traffic is
O(T·d) instead of O(T²) and both matmuls run back-to-back on the MXU with
fp32 accumulation.

The reference computes attention as explicit einsum score matrices
(``odin/networks/attention_mechanism.py:92-595`` via `score_dot` +
`tf.nn.softmax`); this is the TPU-native replacement for the soft/global
path at long sequence lengths.  Gradients are provided by a `custom_vjp`
whose backward recomputes attention with plain XLA ops (the standard
rematerialized-flash recipe: forward saves only the (B,H,T,D) tensors, not
the score matrix).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_fn"]

NEG_INF = -1e30
LANES = 128  # TPU lane width: m/l scratch keeps stats broadcast over lanes


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  sm_scale: float, causal: bool, block_q: int, block_k: int,
                  seq_k: int):
  """One (batch*head, q-block, k-block) grid step.  TPU grid iterations run
  sequentially with the LAST dimension innermost, so the VMEM scratch
  (acc/m/l) carries the online-softmax state across the k dimension."""
  ki = pl.program_id(2)
  nk = pl.num_programs(2)

  @pl.when(ki == 0)
  def _init():
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

  qi = pl.program_id(1)

  def _step():
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # (block_q, block_k)
    k_global = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    valid = k_global < seq_k  # mask zero-padded keys
    if causal:
      q_global = qi * block_q + jax.lax.broadcasted_iota(
          jnp.int32, (block_q, block_k), 0)
      valid = jnp.logical_and(valid, q_global >= k_global)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:, :1]  # (block_q, 1) — all lanes identical
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (block_q, block_k)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p, v.astype(jnp.float32), preferred_element_type=jnp.float32)

  if causal:
    # key blocks strictly above the diagonal contribute nothing — skip
    # their matmuls entirely
    pl.when(ki * block_k <= (qi + 1) * block_q - 1)(_step)
  else:
    _step()

  @pl.when(ki == nk - 1)
  def _finish():
    l = l_ref[:, :1]
    # rows with zero mass (fully padded) emit zeros rather than NaN
    o_ref[0] = jnp.where(l > 0.0, acc_ref[:] / jnp.maximum(l, 1e-30),
                         0.0).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
  pad = (-x.shape[axis]) % mult
  if pad == 0:
    return x
  widths = [(0, 0)] * x.ndim
  widths[axis] = (0, pad)
  return jnp.pad(x, widths)


def _flash_forward(q, k, v, sm_scale, causal, block_q, block_k):
  B, H, Tq, D = q.shape
  Tk = k.shape[2]
  block_q = min(block_q, max(LANES, Tq))
  block_k = min(block_k, max(LANES, Tk))
  # pad head dim to the 128-lane width and sequence dims to block multiples:
  # zero q/k columns leave the scores unchanged, zero v columns are sliced
  # off, padded keys are masked inside the kernel via `seq_k`
  qp = _pad_to(_pad_to(q, 3, LANES), 2, block_q)
  kp = _pad_to(_pad_to(k, 3, LANES), 2, block_k)
  vp = _pad_to(_pad_to(v, 3, LANES), 2, block_k)
  Dp = qp.shape[3]
  qp = qp.reshape(B * H, -1, Dp)
  kp = kp.reshape(B * H, -1, Dp)
  vp = vp.reshape(B * H, -1, Dp)
  n_q = qp.shape[1] // block_q
  n_k = kp.shape[1] // block_k

  kernel = functools.partial(
      _flash_kernel, sm_scale=float(sm_scale), causal=bool(causal),
      block_q=block_q, block_k=block_k, seq_k=Tk)
  out = pl.pallas_call(
      kernel,
      grid=(B * H, n_q, n_k),
      in_specs=[
          pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, block_k, Dp), lambda b, i, j: (b, j, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, block_q, Dp), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
      scratch_shapes=[
          pltpu.VMEM((block_q, Dp), jnp.float32),
          pltpu.VMEM((block_q, LANES), jnp.float32),
          pltpu.VMEM((block_q, LANES), jnp.float32),
      ],
      cost_estimate=pl.CostEstimate(
          flops=4 * B * H * n_q * block_q * n_k * block_k * Dp,
          bytes_accessed=(qp.size + kp.size + vp.size + qp.size) * 4,
          transcendentals=B * H * n_q * block_q * n_k * block_k,
      ),
  )(qp, kp, vp)
  out = out.reshape(B, H, -1, Dp)[:, :, :Tq, :D]
  return out


def _reference_attention(q, k, v, sm_scale, causal):
  s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
  if causal:
    Tq, Tk = q.shape[2], k.shape[2]
    mask = jnp.arange(Tq)[:, None] >= jnp.arange(Tk)[None, :]
    s = jnp.where(mask, s, NEG_INF)
  p = jax.nn.softmax(s, axis=-1)
  return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    sm_scale: Optional[float] = None, causal: bool = False,
                    block_q: int = 128, block_k: int = 128) -> jnp.ndarray:
  """Tiled online-softmax attention over (B, H, T, D) tensors.

  Forward runs as one Pallas kernel (no (Tq, Tk) score matrix in HBM);
  backward rematerializes attention with plain XLA ops, so peak memory is
  O(B·H·T·D) in both passes.  `sm_scale` defaults to 1/sqrt(D)."""
  if sm_scale is None:
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
  return _flash_forward(q, k, v, sm_scale, causal, block_q, block_k)


def _fwd(q, k, v, sm_scale, causal, block_q, block_k):
  if sm_scale is None:
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
  return _flash_forward(q, k, v, sm_scale, causal, block_q, block_k), (q, k,
                                                                       v)


def _bwd(sm_scale, causal, block_q, block_k, res, g):
  q, k, v = res
  if sm_scale is None:
    sm_scale = 1.0 / math.sqrt(q.shape[-1])
  _, vjp = jax.vjp(
      lambda q_, k_, v_: _reference_attention(q_, k_, v_, sm_scale, causal),
      q, k, v)
  return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_fn(query, key, value, bias=None, mask=None,
                       broadcast_dropout=True, dropout_rng=None,
                       dropout_rate=0.0, deterministic=False, dtype=None,
                       precision=None, module=None, **_):
  """Drop-in `attention_fn` for `flax.linen.MultiHeadDotProductAttention`
  operating on (B, T, H, D) tensors.  Falls back to flax's reference
  attention whenever a bias/mask/dropout is requested (those paths need the
  explicit score matrix)."""
  if bias is not None or mask is not None or (dropout_rate > 0.0 and
                                              not deterministic):
    from flax.linen.attention import dot_product_attention
    return dot_product_attention(
        query, key, value, bias=bias, mask=mask,
        broadcast_dropout=broadcast_dropout, dropout_rng=dropout_rng,
        dropout_rate=dropout_rate, deterministic=deterministic, dtype=dtype,
        precision=precision)
  q = jnp.swapaxes(query, 1, 2)
  k = jnp.swapaxes(key, 1, 2)
  v = jnp.swapaxes(value, 1, 2)
  return jnp.swapaxes(flash_attention(q, k, v), 1, 2)
