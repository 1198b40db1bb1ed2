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


@pytest.mark.parametrize("score", ["dot", "additive", "cosine", "general",
                                   "location"])
@pytest.mark.parametrize("position", ["global", "local_m", "local_p"])
def test_attention_score_position_algebra(score, position):
  """Every score x position combination produces normalized weights of the
  right shape (reference flag algebra, ``attention_mechanism.py:92-595``)."""
  if score == "location" and position != "global":
    pytest.skip("reference: ScoreLocation only supports Global")
  keys = jnp.asarray(np.random.RandomState(2).randn(2, 20, 16).astype("f"))
  mod = Attention(units=16, score=score, position=position, window=4)
  (ctx, w), _ = apply(mod, X3, keys)
  assert ctx.shape == (2, 10, 16)
  Tv = 4 if position == "local_m" else 20
  assert w.shape == (2, 10, Tv)
  assert np.all(np.isfinite(np.asarray(w)))
  np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-4)


def test_local_m_attends_trailing_window():
  """local_m (monotonic) ignores all but the trailing `window` keys."""
  keys = np.random.RandomState(3).randn(2, 20, 16).astype("f")
  mod = Attention(units=16, position="local_m", window=4)
  vs = mod.init(KEY, X3, jnp.asarray(keys))
  base, _ = mod.apply(vs, X3, jnp.asarray(keys))
  pert = keys.copy()
  pert[:, :16] = 99.0  # change keys OUTSIDE the trailing window
  out, _ = mod.apply(vs, X3, jnp.asarray(pert))
  np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


@pytest.mark.parametrize("align,estimator", [("relaxed", "st"),
                                             ("hard", "st"),
                                             ("hard", "reinforce")])
def test_sampling_attention_modes(align, estimator):
  """Hard/relaxed alignment: samples have the right form AND gradients flow
  to the parameters (straight-through / DiCE-REINFORCE estimators)."""
  keys = jnp.asarray(np.random.RandomState(4).randn(2, 20, 16).astype("f"))
  mod = Attention(units=16, align=align, estimator=estimator,
                  temperature=0.5)
  rngs = {"params": KEY, "sample": jax.random.PRNGKey(7)}
  vs = mod.init(rngs, X3, keys)

  def loss_fn(params):
    ctx, w = mod.apply(params, X3, keys,
                       rngs={"sample": jax.random.PRNGKey(7)})
    return jnp.sum(ctx ** 2), w

  (val, w), grads = jax.value_and_grad(loss_fn, has_aux=True)(vs)
  assert np.isfinite(float(val))
  if align == "hard":
    # forward value is an exact one-hot selection
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, rtol=1e-5)
    assert np.all((np.asarray(w) == 0) | np.isclose(np.asarray(w), 1.0))
  gnorm = sum(float(jnp.sum(jnp.abs(g)))
              for g in jax.tree_util.tree_leaves(grads))
  assert gnorm > 0, f"no gradient flow for {align}/{estimator}"


@pytest.mark.slow
def test_sequential_attention_vae_switches_modes():
  """SequentialAttentionVAE accepts the full mode algebra (VERDICT r1 #6)."""
  from odin_tpu.bay.vi import SequentialAttentionVAE
  rng = np.random.RandomState(8)
  x = rng.randn(4, 6, 3).astype("f")
  for kw in (dict(attn_score="additive", attn_position="local_m",
                  attn_window=3),
             dict(attn_align="hard"),
             dict(attn_align="relaxed", attn_position="local_p")):
    vae = SequentialAttentionVAE(rnn_units=8, input_shape=(6, 3),
                                 **kw).build(seed=0)
    llk, kl, _ = vae.elbo_components(vae.state.params, x,
                                     jax.random.PRNGKey(0), 0, training=True)
    assert np.all(np.isfinite(np.asarray(llk["llk_observation"])))
    assert np.all(np.isfinite(np.asarray(kl["kl_attention"])))


@pytest.mark.slow  # 130s+ of conv-resnet compile on the 1-core box
def test_cifar_resnet_path_smoke_trains():
  """get_networks('cifar10', resnet=True): SE-residual encoder /
  up-sampling residual decoder builds and trains (VERDICT r1 #10)."""
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  nets = get_networks("cifar10", zdim=16, resnet=True,
                      distribution="bernoulli")
  vae = BetaVAE(**nets).build(seed=0)
  x = (np.random.RandomState(0).rand(8, 32, 32, 3) < 0.5).astype("f")
  step = vae.make_step_fn(learning_rate=1e-3)
  state = vae.state
  losses = []
  for _ in range(8):
    state, m = step(state, x)
    losses.append(float(m["loss"]))
  assert np.all(np.isfinite(losses))
  # the untrained posterior's KL spikes on the first update, then the loss
  # declines steadily — measure learning from the post-spike point
  assert losses[-1] < losses[1]


def test_attention_mechanism_flags_to_fields():
  from odin_tpu.networks.attention import AttentionMechanism as M
  f = (M.ScoreAdditive | M.LocalM | M.Hard).to_fields()
  assert f == dict(score="additive", position="local_m", align="hard")
  f = (M.ScoreDot | M.Global | M.Soft).to_fields()
  assert f == dict(score="dot", position="global", align="soft")


@pytest.mark.slow
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


@pytest.mark.slow
def test_resnets_and_pixelcnn():
  out, _ = apply(ResidualSequential(filters=(8, 16), strides=(1, 2)), X4)
  assert out.shape == (2, 8, 8, 16)
  out, _ = apply(SqueezeExcitation(), X4)
  assert out.shape == X4.shape
  out, _ = apply(PixelCNNDecoder(output_shape=(8, 8, 3), n_layers=2),
                 jnp.ones((2, 12)))
  assert out.shape == (2, 8, 8, 6)


@pytest.mark.slow
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


def test_space_to_depth_conv_exact():
  """`SpaceToDepthConv` == Conv(F, 4, 2, SAME) exactly, with an identical
  param pytree (kernel (4,4,C,F) + bias) — the TPU first-conv layout
  rewrite (BASELINE.md; wired via get_networks(..., space_to_depth=True))."""
  import jax
  from odin_tpu.networks.base import Conv, SpaceToDepthConv
  rng = np.random.RandomState(0)
  for H, C in ((64, 1), (28, 3)):
    x = jnp.asarray(rng.rand(2, H, H, C).astype("f"))
    conv = Conv(32, 4, 2, "elu")
    p = conv.init(jax.random.PRNGKey(0), x)
    inner = p["params"]["Conv_0"]
    p2 = {"params": {"kernel": inner["kernel"], "bias": inner["bias"]}}
    y_ref = conv.apply(p, x)
    y_s2d = SpaceToDepthConv(32, "elu").apply(p2, x)
    assert y_ref.shape == y_s2d.shape == (2, H // 2, H // 2, 32)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_s2d),
                               atol=2e-6)
  # gradient path matches too
  def loss_ref(params):
    return jnp.sum(conv.apply(params, x) ** 2)
  def loss_s2d(params):
    return jnp.sum(SpaceToDepthConv(32, "elu").apply(
        {"params": {"kernel": params["params"]["Conv_0"]["kernel"],
                    "bias": params["params"]["Conv_0"]["bias"]}}, x) ** 2)
  g1 = jax.grad(loss_ref)(p)["params"]["Conv_0"]["kernel"]
  g2 = jax.grad(loss_s2d)(p)["params"]["Conv_0"]["kernel"]
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4,
                             atol=2e-4)
  # factory wiring
  from odin_tpu.networks import get_networks
  nets = get_networks("dsprites", zdim=4, space_to_depth=True)
  names = [type(l).__name__ for l in nets["encoder"].layers]
  assert "SpaceToDepthConv" in names


@pytest.mark.slow  # ~14s of CPU conv compiles; exactness only
def test_subpixel_conv_transpose_exact():
  """`ConvTranspose(subpixel=True)` must
  equal `nn.ConvTranspose` exactly — outputs AND gradients AND the param
  pytree (`{'ConvTranspose_0': {kernel, bias}}`), so checkpoints swap
  freely.  The subpixel form replaces the zero-dilated-input conv with a
  dense stride-1 conv to s·s·F channels + depth-to-space (BASELINE.md)."""
  import jax
  from odin_tpu.networks.base import ConvTranspose
  rng = np.random.RandomState(1)
  for k, s, C in ((4, 2, 3), (5, 2, 1), (3, 2, 4), (4, 4, 2)):
    x = jnp.asarray(rng.rand(2, 8, 8, C).astype("f"))
    slow = ConvTranspose(16, k, s, "elu", subpixel=False)
    fast = ConvTranspose(16, k, s, "elu", subpixel=True)
    p = slow.init(jax.random.PRNGKey(0), x)
    assert set(p["params"]["ConvTranspose_0"]) == {"kernel", "bias"}
    # identical pytree: fast init produces the same leaves' shapes
    pf = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pf)
    y_slow = slow.apply(p, x)
    y_fast = fast.apply(p, x)
    assert y_fast.shape == (2, 8 * s, 8 * s, 16)
    np.testing.assert_allclose(np.asarray(y_slow), np.asarray(y_fast),
                               atol=3e-6)

    def loss(params, mod):
      return jnp.sum(mod.apply(params, x) ** 2)

    g1 = jax.grad(loss)(p, slow)["params"]["ConvTranspose_0"]["kernel"]
    g2 = jax.grad(loss)(p, fast)["params"]["ConvTranspose_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_residual_bottleneck_and_inverted():
  """Bottleneck/inverted residual variants (reference
  ``odin/networks/resnets.py:618-811``): channel squeeze/expand shapes,
  skip rule (identity add only when shapes preserved), depthwise conv in
  the inverted block, and the design dispatcher."""
  import jax
  import jax.numpy as jnp
  from odin_tpu.networks import (ResidualBottleneck, ResidualInverted,
                                 residual_design)

  x = jnp.ones((2, 8, 8, 16))
  rng = jax.random.PRNGKey(0)

  # shape-preserving: output matches input, residual add present
  blk = ResidualBottleneck(shrink_ratio=0.5, batchnorm=False)
  params = blk.init(rng, x)
  y = blk.apply(params, x)
  assert y.shape == x.shape
  # squeeze width: first conv has 8 = 16 * 0.5 output channels
  flat = jax.tree_util.tree_leaves_with_path(params)
  conv0 = [l for p, l in flat if "Conv_0" in str(p) and l.ndim == 4][0]
  assert conv0.shape[-1] == 8

  # channel change or stride drops the skip (no error, new shape)
  blk2 = ResidualBottleneck(filters_out=32, strides=2, batchnorm=False)
  p2 = blk2.init(rng, x)
  assert blk2.apply(p2, x).shape == (2, 4, 4, 32)

  inv = ResidualInverted(expand_ratio=2.0, batchnorm=False)
  pi = inv.init(rng, x)
  assert inv.apply(pi, x).shape == x.shape
  # expand width: first conv has 32 = 16 * 2 channels; depthwise kernel has
  # input-channel dim 1 (feature_group_count == channels)
  flat = jax.tree_util.tree_leaves_with_path(pi)
  convs = sorted([(str(p), l) for p, l in flat if l.ndim == 4])
  assert convs[0][1].shape[-1] == 32            # expand conv
  assert convs[1][1].shape[-2] == 1             # depthwise: I/g == 1

  # dispatcher mirrors the reference factory
  assert isinstance(residual_design("bottleneck", ratio=0.25),
                    ResidualBottleneck)
  assert isinstance(residual_design("inverted", ratio=3.0), ResidualInverted)
  import pytest as _pytest
  with _pytest.raises(NotImplementedError):
    residual_design("nope")

  # sigmoid gating halves the doubled projection back to filters_out
  gated = ResidualInverted(sigmoid_gating=True, batchnorm=False)
  pg = gated.init(rng, x)
  assert gated.apply(pg, x).shape == x.shape
