"""Spatial-code VQ-VAE + EMA dead-code restarts (VERDICT r3 weak #3).

The reference's VQVAE quantizes the conv feature MAP (every spatial
position gets a code, ``odin/bay/vi/autoencoder/vq_vae.py:60-247``); the
round-1 rebuild quantized one bottleneck vector per image and recorded the
classic codebook collapse.  These tests pin the differential semantics:
spatial vs vector quantization produce different code-usage SHAPES, and
dead-code restarts re-seed dying codebook entries in-graph.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odin_tpu.bay.vi.autoencoder.vq_vae import VQVAE, VectorQuantizer
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.networks.base import (
    Conv, ConvTranspose, Dense, Flatten, Reshape, SequentialNetwork)


def _tiny_spatial_nets():
  from odin_tpu.networks.image_networks import PackImageParams
  encoder = SequentialNetwork((
      Conv(8, 3, 2, "relu"),    # (4, 4, 8)
      Conv(8, 3, 1, "relu"),    # (4, 4, 8) — map kept
  ), name="encoder")
  decoder = SequentialNetwork((
      Conv(8, 3, 1, "relu"),
      ConvTranspose(8, 3, 2, "relu"),   # (8, 8, 8)
      Conv(1, 1, 1, None),
      PackImageParams(1),
  ), name="decoder")
  return dict(encoder=encoder, decoder=decoder, latents=None,
              observation=RVconf((8, 8, 1), "bernoulli", projection=False,
                                 name="image"),
              input_shape=(8, 8, 1))


def _tiny_vector_nets():
  from odin_tpu.networks.image_networks import PackImageParams
  encoder = SequentialNetwork((
      Conv(8, 3, 2, "relu"),
      Flatten(),
      Dense(16, None),
  ), name="encoder")
  decoder = SequentialNetwork((
      Dense(4 * 4 * 8, "relu"),
      Reshape((4, 4, 8)),
      ConvTranspose(8, 3, 2, "relu"),
      Conv(1, 1, 1, None),
      PackImageParams(1),
  ), name="decoder")
  return dict(encoder=encoder, decoder=decoder, latents=None,
              observation=RVconf((8, 8, 1), "bernoulli", projection=False,
                                 name="image"),
              input_shape=(8, 8, 1))


def _data(n=64, seed=0):
  rng = np.random.RandomState(seed)
  x = np.zeros((n, 8, 8, 1), np.float32)
  for i in range(n):  # random 3x3 blocks: position structure for the codes
    r, c = rng.randint(0, 6, 2)
    x[i, r:r + 3, c:c + 3, 0] = 1.0
  return x


@pytest.mark.slow
def test_spatial_vs_vector_code_usage_shapes():
  """The differential claim: spatial quantization assigns a code per
  position (indices (B, 4, 4), usage pooled over B*16 assignments); vector
  quantization assigns one code per image (indices (B,))."""
  x = _data()
  sp = VQVAE(spatial=True, ema=True, n_codes=16, code_dim=8,
             **_tiny_spatial_nets()).build(seed=0)
  ve = VQVAE(spatial=False, ema=True, n_codes=16, code_dim=8,
             **_tiny_vector_nets()).build(seed=0)
  sp.fit_device_dataset(x, n_steps=60, batch_size=16, steps_per_call=30,
                        learning_rate=3e-4, verbose=False)
  ve.fit_device_dataset(x, n_steps=60, batch_size=16, steps_per_call=30,
                        learning_rate=3e-4, verbose=False)
  i_sp = np.asarray(sp.encode_codes(x))
  i_ve = np.asarray(ve.encode_codes(x))
  assert i_sp.shape == (64, 4, 4)
  assert i_ve.shape == (64,)
  # spatial pools 64*16 assignments per batch -> usage must be at least as
  # broad as the single-assignment vector model on the same data
  assert len(np.unique(i_sp)) >= len(np.unique(i_ve))
  # spatial decode bypasses MCMC-dim flattening: reconstruction keeps the
  # image batch shape
  vq = sp.encode(x[:4])
  px = sp.decode(np.asarray(vq.mean()))
  assert px.batch_shape[0] == 4


def test_dead_code_restart_reseeds():
  """With inputs clustered far from the init codebook, EMA alone leaves
  unused codes at their init location; restart_dead re-seeds them with
  batch encodings in-graph."""
  def run(restart):
    vq = VectorQuantizer(n_codes=8, code_dim=4, ema=True, ema_decay=0.5,
                         restart_dead=restart, dead_frac=0.2)
    x = jnp.asarray(np.random.RandomState(0).randn(32, 4) * 0.01 + 5.0,
                    jnp.float32)
    variables = vq.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(1)}, x, training=True)
    stats = {"vq_stats": variables["vq_stats"]}
    params = {"params": variables["params"]}

    @jax.jit
    def step(stats, key):
      _, upd = vq.apply({**params, **stats}, x, training=True,
                        mutable=["vq_stats"], rngs={"sample": key})
      return dict(upd)

    key = jax.random.PRNGKey(2)
    for i in range(50):
      stats = step(stats, jax.random.fold_in(key, i))
    cb = np.asarray(stats["vq_stats"]["codebook"])
    # projection maps inputs ~N(5, .01) to some tight cluster h*; measure
    # spread of codebook rows around the USED code's location
    return cb

  cb_restart = run(True)
  cb_plain = run(False)
  # with restarts every row was re-seeded near the (single) active cluster:
  # row spread collapses; without, unused rows keep their random init
  spread_restart = np.mean(np.std(cb_restart, axis=0))
  spread_plain = np.mean(np.std(cb_plain, axis=0))
  assert spread_restart < 0.5 * spread_plain, (spread_restart, spread_plain)


def test_spatial_commitment_loss_reduces_to_batch():
  """Per-position commitment losses must be summed to (B,) before entering
  the ELBO (a (B,) llk minus a (B,H,W) kl would silently broadcast)."""
  x = _data(16)
  sp = VQVAE(spatial=True, ema=True, n_codes=8, code_dim=8,
             **_tiny_spatial_nets()).build(seed=0)
  llk, kl, aux = sp.elbo_components(
      sp.state.params, jnp.asarray(x), jax.random.PRNGKey(0), 0, False,
      sp.state.mutables)
  assert llk["llk_image"].shape == (16,)
  assert kl["commitment"].shape == (16,)
