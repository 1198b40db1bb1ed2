"""Conditional label-embedder family.

Mirrors reference ``odin/networks/conditional_embedding.py`` (Identity :47,
Repetition :61, Dictionary :94, Projection :129, Sequential :153,
get_embedding :220) and its wiring into ConditionalM2VAE
(``conditional_vae.py:324-392``): each embedder maps labels to a dense
tensor for q(z|x,y)/p(x|z,y) conditioning; ``embedding_method`` selects the
embedder on the M2/ADGM trunks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odin_tpu.networks import get_networks
from odin_tpu.networks.conditional_embedding import (
    DictionaryEmbedding,
    IdentityEmbedding,
    ProjectionEmbedding,
    RepetitionEmbedding,
    SequentialEmbedding,
    all_embedder,
    get_embedding,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(mod, y):
  params = mod.init(KEY, y)
  return params, mod.apply(params, y)


def test_get_embedding_dispatch():
  assert get_embedding("dictionary") is DictionaryEmbedding
  assert get_embedding("seq") is SequentialEmbedding
  assert get_embedding("PROJECTION ") is ProjectionEmbedding
  assert get_embedding("repetition") is RepetitionEmbedding
  assert get_embedding("identity") is IdentityEmbedding
  with pytest.raises(KeyError):
    get_embedding("nope")
  assert set(all_embedder) == {"identity", "repetition", "projection",
                               "dictionary", "sequential"}


@pytest.mark.parametrize("method", ["dictionary", "projection", "sequential"])
def test_embedder_shapes_int_and_onehot(method):
  """Int indices and their one-hot encodings must embed identically for the
  lookup/projection embedders (reference `_to_categorical`, ``:32``)."""
  cls = get_embedding(method)
  mod = cls(n_classes=5, event_shape=(7,))
  idx = jnp.array([0, 3, 4, 1])
  onehot = jax.nn.one_hot(idx, 5)
  params = mod.init(KEY, idx)
  out_i = mod.apply(params, idx)
  out_h = mod.apply(params, onehot)
  assert out_i.shape == (4, 7)
  np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_h), atol=1e-6)


def test_embedder_event_shape_multi_axis():
  """Multi-axis event shapes reshape to (B, *event_shape) — the
  ConditionalGAN label-plane use case."""
  mod = SequentialEmbedding(n_classes=3, event_shape=(4, 4, 2),
                            embedding_dim=8)
  idx = jnp.array([0, 1, 2])
  _, out = _init_apply(mod, idx)
  assert out.shape == (3, 4, 4, 2)


def test_identity_passthrough_and_repetition_tile():
  y = jax.nn.one_hot(jnp.array([0, 1]), 3)
  ident = IdentityEmbedding(n_classes=3, event_shape=(3,))
  np.testing.assert_array_equal(np.asarray(ident.apply({}, y)),
                                np.asarray(y))
  # repetition tiles a (B, 1) label column across the event axes
  rep = RepetitionEmbedding(n_classes=2, event_shape=(4, 3))
  col = jnp.array([[1.0], [0.0]])
  out = rep.apply({}, col)
  assert out.shape == (2, 4, 3)
  np.testing.assert_array_equal(np.asarray(out[0]), np.ones((4, 3), "f"))
  np.testing.assert_array_equal(np.asarray(out[1]), np.zeros((4, 3), "f"))


def test_projection_keeps_soft_gradients_dictionary_folds():
  """Projection must propagate d(out)/d(y) for soft labels (the M2 relaxed
  path trains through them); dictionary argmax-folds soft labels, so its
  label-gradient is exactly zero while its table still receives gradient."""
  soft = jax.nn.softmax(jnp.array([[0.2, 1.0, -0.3]]), -1)

  proj = ProjectionEmbedding(n_classes=3, event_shape=(5,))
  p_proj = proj.init(KEY, soft)
  g_y = jax.grad(lambda y: jnp.sum(proj.apply(p_proj, y) ** 2))(soft)
  assert float(jnp.abs(g_y).sum()) > 0.0

  dic = DictionaryEmbedding(n_classes=3, event_shape=(5,))
  p_dic = dic.init(KEY, soft)
  g_y = jax.grad(lambda y: jnp.sum(dic.apply(p_dic, y) ** 2))(soft)
  np.testing.assert_array_equal(np.asarray(g_y), 0.0)
  g_tab = jax.grad(
      lambda p: jnp.sum(dic.apply(p, soft) ** 2))(p_dic)
  assert float(jnp.abs(
      g_tab["params"]["table"]["embedding"]).sum()) > 0.0


def test_m2_embedding_method_selects_param_structure():
  """embedding_method must change the M2 trunk's label path: 'dictionary'
  creates an Embed table where the default 'projection' has a Dense kernel
  (reference ConditionalM2VAE ``:324-392``) — and both train a step."""
  from odin_tpu.bay.vi.autoencoder.conditional_vae import M2VAE

  def build(method):
    nets = get_networks("halfmoons", zdim=4, is_semi_supervised=True)
    return M2VAE(embedding_method=method, **nets).build(seed=0)

  m_proj = build("projection")
  m_dict = build("dictionary")
  y_qz_proj = m_proj.state.params["vae"]["y_to_qz"]
  y_qz_dict = m_dict.state.params["vae"]["y_to_qz"]
  assert "proj" in y_qz_proj and "table" in y_qz_dict

  rng = np.random.RandomState(1)
  y_idx = rng.randint(0, 2, 16)
  x = np.eye(2, dtype="f")[y_idx] + 0.3 * rng.randn(16, 2).astype("f")
  batch = (x, np.eye(2, dtype="f")[y_idx], np.ones(16, "f"))
  for m in (m_proj, m_dict):
    llk, kl, _ = m.elbo_components(m.state.params, batch, KEY, 0,
                                   training=True)
    assert np.isfinite(float(np.mean(llk["llk_image"])))
  # the two trunks are genuinely different functions of the labels
  assert jax.tree_util.tree_structure(y_qz_proj) != \
      jax.tree_util.tree_structure(y_qz_dict)


def test_conditional_m2_defaults_to_sequential():
  """ConditionalM2VAE defaults to the 'sequential' embedder (reference
  ``conditional_vae.py:325``) — table + projection params both present."""
  from odin_tpu.bay.vi.autoencoder.conditional_vae import ConditionalM2VAE
  nets = get_networks("halfmoons", zdim=4, is_semi_supervised=True)
  m = ConditionalM2VAE(**nets).build(seed=0)
  y_qz = m.state.params["vae"]["y_to_qz"]
  assert "table" in y_qz and "proj" in y_qz
