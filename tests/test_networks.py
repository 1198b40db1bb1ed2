"""Network layer zoo: shapes + semantic checks (attention masks, TDNN
contexts, masked-conv causality, batch renorm stats)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odin_tpu.networks import (
    Attention, BatchRenormalization, ConditionalEmbedding,
    ConditionalProjection, Conv1DTranspose, GlobalAttention, GRU, LSTM,
    LocalPredictiveAttention, MaskedConv2D, MultiHeadAttention,
    ParallelNetwork, PixelCNNDecoder, PositionalEncoder, ResidualSequential,
    SelfAttention, SkipConnection, SqueezeExcitation, StatsPool, TimeDelay,
    TimeDelayConv, TimeDelayConvTied, TimeDelayDense, XVectorNet)
from odin_tpu.networks.base import Dense, NetConf

KEY = jax.random.PRNGKey(0)
X3 = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16).astype("f"))
X4 = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 8).astype("f"))


def apply(mod, *args, **kw):
  vs = mod.init(KEY, *args, **kw)
  return mod.apply(vs, *args, **kw), vs


def test_attention_shapes_and_weights():
  (ctx, w), _ = apply(Attention(units=16), X3)
  assert ctx.shape == (2, 10, 16)
  np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)


def test_causal_attention_is_causal():
  mod = Attention(units=16, causal=True)
  vs = mod.init(KEY, X3)
  base, _ = mod.apply(vs, X3)
  pert = X3.at[:, -1].set(99.0)  # change only the LAST step
  out, _ = mod.apply(vs, pert)
  # all earlier steps unchanged
  np.testing.assert_allclose(np.asarray(out[:, :-1]),
                             np.asarray(base[:, :-1]), atol=1e-5)


def test_cross_and_local_attention():
  keys = jnp.asarray(np.random.RandomState(2).randn(2, 20, 16).astype("f"))
  out, _ = apply(GlobalAttention(units=16), X3, keys)
  assert out.shape == (2, 10, 16)
  out, _ = apply(LocalPredictiveAttention(units=16, window=4), X3, keys)
  assert out.shape == (2, 10, 16)
  out, _ = apply(MultiHeadAttention(num_heads=4), X3)
  assert out.shape == (2, 10, 16)


def test_tdnn_context_shapes():
  out, _ = apply(TimeDelay(units=32, context=(-2, -1, 0, 1, 2)), X3)
  assert out.shape == (2, 6, 32)   # T - span + 1
  out, _ = apply(TimeDelay(units=32, context=(-3, 0, 3)), X3)
  assert out.shape == (2, 4, 32)
  out, _ = apply(TimeDelayDense(units=32), X3)
  assert out.shape == (2, 10, 32)
  out, _ = apply(TimeDelayConvTied(32, dilations=(1, 2)), X3)
  assert out.shape == (2, 10, 32)
  out, _ = apply(StatsPool(), X3)
  assert out.shape == (2, 32)
  emb, _ = apply(XVectorNet(n_classes=0), X3)
  assert emb.shape == (2, 512)


def test_masked_conv_causality():
  mod = MaskedConv2D(4, 5, "A")
  vs = mod.init(KEY, X4)
  base = mod.apply(vs, X4)
  pert = X4.at[:, 8, 8, :].set(99.0)
  diff = np.abs(np.asarray(mod.apply(vs, pert) - base))
  assert diff[0, 8, 8].max() == 0.0      # type A: center excluded
  assert diff[0, :8].max() == 0.0        # rows above unaffected
  assert diff[0, 8, :8].max() == 0.0     # left of center unaffected
  assert diff[0, 9:].max() > 0.0         # rows below see it


def test_resnets_and_pixelcnn():
  out, _ = apply(ResidualSequential(filters=(8, 16), strides=(1, 2)), X4)
  assert out.shape == (2, 8, 8, 16)
  out, _ = apply(SqueezeExcitation(), X4)
  assert out.shape == X4.shape
  out, _ = apply(PixelCNNDecoder(output_shape=(8, 8, 3), n_layers=2),
                 jnp.ones((2, 12)))
  assert out.shape == (2, 8, 8, 6)


def test_util_layers():
  out, _ = apply(Conv1DTranspose(8, 3, 2), X3)
  assert out.shape == (2, 20, 8)
  out, _ = apply(ParallelNetwork(layers=(Dense(4), Dense(6))),
                 jnp.ones((2, 8)))
  assert out.shape == (2, 10)
  out, _ = apply(PositionalEncoder(), X3)
  assert out.shape == X3.shape
  out, _ = apply(SkipConnection(layer=Dense(32)), jnp.ones((2, 8)))
  assert out.shape == (2, 32)
  out, _ = apply(ConditionalEmbedding(10, 16), jnp.eye(10)[:2])
  assert out.shape == (2, 16)
  out, _ = apply(ConditionalProjection(16, "film"), X3, jnp.ones((2, 10)))
  assert out.shape == X3.shape
  out, _ = apply(LSTM(24), X3)
  assert out.shape == (2, 10, 24)
  out, _ = apply(GRU(24, return_sequences=False), X3)
  assert out.shape == (2, 24)


def test_batch_renorm_updates_stats():
  mod = BatchRenormalization()
  vs = mod.init(KEY, X3)
  out, mutated = mod.apply(vs, X3 + 3.0, training=True,
                           mutable=["batch_stats"])
  assert float(jnp.abs(mutated["batch_stats"]["mean"]).sum()) > 0
  out_eval = mod.apply({**vs, **mutated}, X3, training=False)
  assert out_eval.shape == X3.shape


def test_netconf():
  conf = NetConf(units=[32, 16], network="dense", activation="relu")
  net = conf.create_network()
  vs = net.init(KEY, jnp.ones((2, 8)))
  assert net.apply(vs, jnp.ones((2, 8))).shape == (2, 16)
  dec = conf.create_decoder_network(output_shape=(8,))
  vs2 = dec.init(KEY, jnp.ones((2, 16)))
  assert dec.apply(vs2, jnp.ones((2, 16))).shape == (2, 8)
