"""Pallas flash attention vs explicit-softmax reference attention.

The kernel (ops/pallas_attention.py) must match the naive XLA path to fp32
matmul precision in forward AND gradients (custom_vjp backward), including
causal masking, cross-attention lengths, and non-tile-aligned shapes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from odin_tpu.ops.pallas_attention import (_reference_attention,
                                           flash_attention)

RNG = np.random.RandomState(7)


def _rand(*shape):
  return jnp.asarray(RNG.randn(*shape).astype("f") * 0.5)


@pytest.mark.slow
@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(causal):
  q, k, v = _rand(1, 2, 200, 32), _rand(1, 2, 200, 32), _rand(1, 2, 200, 32)
  ref = _reference_attention(q, k, v, 32 ** -0.5, causal)
  with pltpu.force_tpu_interpret_mode():
    out = flash_attention(q, k, v, causal=causal)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_flash_cross_attention_lengths():
  """Tq != Tk and both non-multiples of the block size."""
  q, k, v = _rand(1, 1, 130, 16), _rand(1, 1, 300, 16), _rand(1, 1, 300, 16)
  ref = _reference_attention(q, k, v, 16 ** -0.5, False)
  with pltpu.force_tpu_interpret_mode():
    out = flash_attention(q, k, v)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_flash_gradients():
  q, k, v = _rand(1, 1, 150, 16), _rand(1, 1, 150, 16), _rand(1, 1, 150, 16)
  w = _rand(1, 1, 150, 16)  # projection weights so grads aren't uniform

  def loss_flash(q_, k_, v_):
    return jnp.sum(flash_attention(q_, k_, v_, None, True) * w)

  def loss_ref(q_, k_, v_):
    return jnp.sum(_reference_attention(q_, k_, v_, 16 ** -0.5, True) * w)

  with pltpu.force_tpu_interpret_mode():
    gq, gk, gv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
  np.testing.assert_allclose(np.asarray(gq), np.asarray(rq), atol=1e-4)
  np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
  np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), atol=1e-4)


@pytest.mark.slow
def test_flash_attention_fn_in_flax_mha():
  """flash_attention_fn plugs into flax MultiHeadDotProductAttention and
  matches the default attention_fn."""
  import flax.linen as nn

  from odin_tpu.ops.pallas_attention import flash_attention_fn
  x = _rand(2, 64, 32)
  mha_ref = nn.MultiHeadDotProductAttention(num_heads=4)
  mha_flash = nn.MultiHeadDotProductAttention(
      num_heads=4, attention_fn=flash_attention_fn)
  params = mha_ref.init(jax.random.PRNGKey(0), x, x, x)
  ref = mha_ref.apply(params, x, x, x)
  with pltpu.force_tpu_interpret_mode():
    out = mha_flash.apply(params, x, x, x)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
