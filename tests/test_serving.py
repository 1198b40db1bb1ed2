"""Serving export: StableHLO artifacts runnable without model code."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odin_tpu.bay.vi import BetaVAE
from odin_tpu.networks import get_networks
from odin_tpu.serving import ServingBundle, export_fn, export_vae, load_fn


def test_export_roundtrip_batch_polymorphic():
  f = lambda x, w: x @ w + 1.0
  x = jnp.ones((2, 3))
  w = jnp.ones((3, 4))
  blob = export_fn(f, (x, w), batch_polymorphic=True)
  g = load_fn(blob)
  # different batch size through the SAME artifact
  out = g(jnp.ones((5, 3)), jnp.ones((3, 4)))
  assert out.shape == (5, 4)
  np.testing.assert_allclose(np.asarray(out), 4.0)


def test_export_vae_bundle(tmp_path):
  vae = BetaVAE(**get_networks("halfmoons", zdim=2)).build(seed=3)
  X = np.random.RandomState(0).rand(16, 2).astype("f")

  def it(n):
    r = np.random.RandomState(1)
    for _ in range(n):
      yield X[r.randint(0, 16, 8)]

  vae.fit(it(5), max_iter=5, logging_interval=1e9, verbose=False)
  bundle = export_vae(vae, str(tmp_path / "bundle"))
  assert set(bundle.names()) == {"encode_mean", "decode_mean", "reconstruct"}
  # fresh bundle object = serving process without the model
  serving = ServingBundle(str(tmp_path / "bundle"))
  z = serving["encode_mean"](jnp.asarray(X))
  assert z.shape == (16, 2)
  recon = serving["reconstruct"](jnp.asarray(X[:4]))
  assert recon.shape == (4, 2)
  # matches the live model
  z_live = np.asarray(vae.encode(X).mean())
  np.testing.assert_allclose(np.asarray(z), z_live, atol=1e-5)


@pytest.mark.slow
def test_fit_device_dataset_pytree_batch():
  from odin_tpu.bay.vi import MultitaskVAE
  from odin_tpu.bay.random_variable import RVconf
  nets = get_networks("halfmoons", zdim=2)
  vae = MultitaskVAE(labels=RVconf(2, "onehot", name="moon"), **nets).build()
  rng = np.random.RandomState(0)
  X = rng.rand(64, 2).astype("f")
  Y = np.eye(2, dtype="f")[rng.randint(0, 2, 64)]
  M = np.ones(64, "f")
  vae.fit_device_dataset((X, Y, M), n_steps=60, batch_size=16,
                         steps_per_call=30, verbose=False)
  assert vae.step == 60


@pytest.mark.slow  # export tracing of a 512-wide MLP x2 bundles
def test_int8_quantized_export(tmp_path):
  """`export_vae(quantize=True)` embeds int8 codes + per-channel scales;
  the artifact shrinks ~4x and the served outputs stay close to fp32
  (weight-only symmetric quantization keeps bf16/fp32 activations)."""
  from odin_tpu.serving import quantize_params, dequantize_params

  from odin_tpu.bay.random_variable import RVconf
  from odin_tpu.networks.base import Dense, SequentialNetwork

  # wide enough that weight bytes dominate the StableHLO overhead
  nets = dict(
      encoder=SequentialNetwork((Dense(512, "relu"), Dense(512, "relu")),
                                name="encoder"),
      decoder=SequentialNetwork((Dense(512, "relu"), Dense(512, "relu")),
                                name="decoder"),
      latents=RVconf((2,), "mvndiag", projection=True, name="latents"),
      observation=RVconf((2,), "gaussian", projection=True,
                         name="observation"),
      input_shape=(2,),
  )
  vae = BetaVAE(**nets).build(seed=3)
  X = np.random.RandomState(0).rand(32, 2).astype("f")

  def it(n):
    r = np.random.RandomState(1)
    for _ in range(n):
      yield X[r.randint(0, 32, 16)]

  vae.fit(it(10), max_iter=10, logging_interval=1e9, verbose=False)

  # pytree-level round trip: int8 codes, small leaves untouched
  params = jax.device_get(vae._params_of())
  qp = quantize_params(params, min_size=64)
  codes = [l for l in jax.tree_util.tree_leaves(qp)
           if getattr(l, "dtype", None) == np.int8]
  assert codes, "no leaf was quantized"
  deq = dequantize_params(qp)
  for a, b in zip(jax.tree_util.tree_leaves(params),
                  jax.tree_util.tree_leaves(deq)):
    assert a.shape == b.shape
    # max per-channel error bounded by scale/2 = max|w|/254
    assert float(jnp.max(jnp.abs(a - b))) <= float(jnp.max(jnp.abs(a))) / 254 + 1e-8

  fp32 = export_vae(vae, str(tmp_path / "fp32"))
  q8 = export_vae(vae, str(tmp_path / "int8"), quantize=True)
  size = lambda b: sum(v["bytes"] for v in b.manifest.values())
  assert size(q8) < 0.5 * size(fp32), (size(q8), size(fp32))
  r_fp = np.asarray(fp32["reconstruct"](jnp.asarray(X[:8])))
  r_q8 = np.asarray(q8["reconstruct"](jnp.asarray(X[:8])))
  assert np.all(np.isfinite(r_q8))
  rel = np.max(np.abs(r_fp - r_q8)) / (np.max(np.abs(r_fp)) + 1e-8)
  assert rel < 0.15, rel
