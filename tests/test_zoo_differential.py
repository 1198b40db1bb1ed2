"""Differential semantics for close zoo variants (VERDICT r2 weak #5).

`test_zoo_execution` proves every class executes and descends; this module
proves the *variants are actually different models* — the regression mode
caught in round 1 was close variants silently collapsing into their parent.
Each test pins the documented architectural/objective difference:

- semafod vs semafoh: parallel vs hierarchical label-latent q(z_y|·)
  (reference ``odin/bay/vi/autoencoder/semafo_vae.py:252,390``)
- semafos vs semafosm vs semafosc: conditional vs multitask vs
  simple-conditional decoding (reference ``semafo_vae.py:415,485,502``)
- ConditionalM2VAE: unlabelled objective == exact 2-class enumeration
  (Kingma et al. 2014 Eq. 7; reference ``conditional_vae.py:196-235``)
- TwoStageVAE: the stage-2 step cannot move stage-1 params
  (reference ``two_stage_vae.py:181`` trains the stages sequentially)
- VampriorVAE: MC KL against the mixture prior agrees with the analytic
  normal-normal KL in the K=1 case (reference ``vamprior.py:25``)
- reparamsM3VAE: the learnable PriorRegressor p(z_c|y) exists and receives
  gradient (reference ``conditional_vae.py:547-569``)

All assertions run eagerly on tiny CPU models — no jit compiles.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.vi.autoencoder.conditional_vae import (ConditionalM2VAE,
                                                         M2VAE,
                                                         reparamsM3VAE)
from odin_tpu.bay.vi.autoencoder.semafo_vae import (semafod, semafoh,
                                                    semafos, semafosc,
                                                    semafosm)
from odin_tpu.bay.vi.autoencoder.two_stage_vae import TwoStageVAE
from odin_tpu.bay.vi.autoencoder.vamprior import VampriorVAE
from odin_tpu.bay.vi.utils import marginalize_categorical_labels

from tests.test_zoo_execution import _build_model

KEY = jax.random.PRNGKey(7)


def _leaf_shapes(tree):
  return jax.tree_util.tree_map(lambda a: tuple(a.shape), tree)


def test_semafod_vs_semafoh_differ():
  """semafoh conditions z_y on [h, z] (hierarchical); semafod on h alone —
  the latents_y projection must consume zdim extra inputs, and the
  objectives must differ on the same batch/seed."""
  md, batch_fn = _build_model(semafod)
  mh, _ = _build_model(semafoh)
  pd, ph = md.state.params["vae"], mh.state.params["vae"]

  def latents_y_in_dim(p):
    sub = p["latents_y"]
    kernels = [l for l in jax.tree_util.tree_leaves(sub) if l.ndim == 2]
    return kernels[0].shape[0]

  zdim = md.zdim
  assert latents_y_in_dim(ph) == latents_y_in_dim(pd) + zdim, \
      "semafoh's z_y head must consume [h, z], semafod's h alone"
  # different param *structures* => genuinely different architectures
  assert _leaf_shapes(pd) != _leaf_shapes(ph)

  batch = batch_fn()
  lld, kld, _ = md.elbo_components(md.state.params, batch, KEY, 0,
                                   training=True)
  llh, klh, _ = mh.elbo_components(mh.state.params, batch, KEY, 0,
                                   training=True)
  assert not np.allclose(float(np.mean(lld["llk_observation"])),
                         float(np.mean(llh["llk_observation"]))), \
      "same objective value: variants may have collapsed together"


def test_semafos_family_decode_paths_differ():
  """semafos decodes p(x|z,y); semafosm's decoder ignores y entirely;
  semafosc never sees true labels (always stop-grad predictions)."""
  ms, batch_fn = _build_model(semafos)
  mm, _ = _build_model(semafosm)
  mc, _ = _build_model(semafosc)

  z = jnp.asarray(np.random.RandomState(0).randn(6, ms.zdim), jnp.float32)
  y0 = jnp.tile(jnp.array([[1.0, 0.0]]), (6, 1))
  y1 = jnp.tile(jnp.array([[0.0, 1.0]]), (6, 1))

  def decode_mean(model, y):
    px = model._apply(model.state.params, "decode_zy", z, y, rng=KEY,
                      training=False)
    return np.asarray(px.mean())

  # conditional decoder: the label changes the reconstruction
  assert not np.allclose(decode_mean(ms, y0), decode_mean(ms, y1))
  # multitask decoder: the label is ignored by construction
  np.testing.assert_array_equal(decode_mean(mm, y0), decode_mean(mm, y1))

  # semafos consumes TRUE labels on masked rows; semafosc never does:
  # flipping the labels (mask all-on) must change semafos' llk_image but
  # leave semafosc's bit-identical under the same rng
  x, y, _ = batch_fn()
  mask = np.ones(len(x), "f")
  y_flip = y[:, ::-1].copy()
  for model, should_change in ((ms, True), (mc, False)):
    lla, _, _ = model.elbo_components(model.state.params, (x, y, mask), KEY,
                                      0, training=True)
    llb, _, _ = model.elbo_components(model.state.params, (x, y_flip, mask),
                                      KEY, 0, training=True)
    a, b = np.asarray(lla["llk_observation"]), np.asarray(llb["llk_observation"])
    if should_change:
      assert not np.allclose(a, b), "semafos ignored the true labels"
    else:
      np.testing.assert_array_equal(a, b)


def test_conditional_m2_marginalization_is_exact_enumeration():
  """ConditionalM2VAE's unlabelled bound must equal the exact 2-class
  enumeration Σ_y w(y|x)·ELBO(x, y) (Kingma Eq. 7) — not M2VAE's
  soft-label approximation."""
  model, batch_fn = _build_model(ConditionalM2VAE)
  x, y, mask = batch_fn()
  params = model.state.params
  batch = (x, y, mask)
  llk, kl, _ = model.elbo_components(params, batch, KEY, 0, training=False)
  assert "marginal_elbo" in llk and not kl, \
      "marginalized objective folds the KL into the per-class ELBO"

  # independent reconstruction of the enumeration (same rng discipline)
  k1, k2 = jax.random.split(KEY)
  qy = model._apply(params, "classify", jnp.asarray(x), rng=k1,
                    training=False)
  probs = qy.mean()
  x_m, y_m = marginalize_categorical_labels(jnp.asarray(x), 2)
  llk_x, kl_z, *_ = model._components_xy(params, x_m, y_m, k2, False, None)
  elbo_xy = (llk_x - kl_z).reshape(-1, 2)
  w = mask.reshape(-1, 1) * y + (1 - mask.reshape(-1, 1)) * np.asarray(probs)
  expected = np.sum(w * np.asarray(elbo_xy), -1)
  np.testing.assert_allclose(np.asarray(llk["marginal_elbo"]), expected,
                             rtol=1e-5, atol=1e-5)

  # and it is NOT the parent's objective
  m2, _ = _build_model(M2VAE)
  llk2, _, _ = m2.elbo_components(m2.state.params, batch, KEY, 0,
                                  training=False)
  assert "marginal_elbo" not in llk2 and "llk_image" in llk2


def test_two_stage_vae_stage2_cannot_move_stage1():
  """The stage-2 TrainStep optimizes only the 'stage2' partition and its
  loss has zero gradient w.r.t. every stage-1 param (stop_gradient on z):
  together stage 2 provably leaves stage-1 params bit-identical."""
  model, batch_fn = _build_model(TwoStageVAE)
  steps = model.train_steps()
  assert [s.partitions for s in steps] == [("vae",), ("stage2",)]
  batch = batch_fn()

  def stage2_scalar(params):
    loss, _ = steps[1].loss_fn(params, jnp.asarray(batch), KEY,
                               jnp.zeros((), jnp.int32),
                               model.state.mutables)
    return loss

  grads = jax.grad(stage2_scalar)(model.state.params)
  vae_grads = jax.tree_util.tree_leaves(grads["vae"])
  assert all(np.all(np.asarray(g) == 0.0) for g in vae_grads), \
      "stage-2 loss leaks gradient into stage-1 params"
  s2_grads = jax.tree_util.tree_leaves(grads["stage2"])
  assert any(np.any(np.asarray(g) != 0.0) for g in s2_grads)


def test_vamprior_mc_kl_matches_analytic_at_k1():
  """With a single pseudo-input the VampPrior IS q(z|u_1): the MC estimate
  `E_q[log q(z) - log p(z)]` must agree with the analytic normal-normal KL."""
  from odin_tpu.networks import get_networks
  model = VampriorVAE(n_components=1,
                      **get_networks("halfmoons", zdim=4)).build(seed=0)
  params = model.state.params
  x = jnp.asarray(np.random.RandomState(1).randn(8, 2), jnp.float32)
  qz = model._apply(params, "encode", x, rng=KEY, training=False)
  u = model._apply_module(params, "pseudo_inputs", model._pseudo,
                          training=False)
  q_u = model._apply(params, "encode", u, rng=KEY, training=False)
  analytic = np.asarray(kl_divergence(qz, q_u, analytic=True))

  S = 4096
  zs = qz.sample(KEY, (S,))                      # (S, B, zdim)
  log_q = np.asarray(qz.log_prob(zs))            # (S, B)
  log_p = np.asarray(
      model._log_vamp_prior(params, zs.reshape(-1, model.zdim), KEY, False,
                            None)).reshape(S, -1)
  mc = (log_q - log_p).mean(0)
  np.testing.assert_allclose(mc, analytic, rtol=0.15, atol=0.15)


def test_reparams_m3_prior_regressor_learns():
  """reparamsM3VAE must carry the learnable PriorRegressor p(z_c|y)
  (reference ``conditional_vae.py:547-569``) — the four per-class loc/scale
  vectors exist, receive gradient from the ELBO, and the prior actually
  depends on y once the locs diverge."""
  model, batch_fn = _build_model(reparamsM3VAE)
  params = model.state.params
  reg = params["vae"]["regressor"]
  assert set(reg) == {"diag_loc_true", "diag_loc_false",
                      "diag_scale_true", "diag_scale_false"}
  batch = batch_fn()

  def scalar_loss(p):
    llk, kl, _ = model.elbo_components(p, jnp.asarray(batch[0]), KEY, 0,
                                       training=True)
    return -jnp.mean(model.elbo(llk, kl))

  # unsupervised path: soft labels still feed the prior -> gradient flows
  grads = jax.grad(scalar_loss)(params)
  reg_grads = grads["vae"]["regressor"]
  assert any(np.any(np.asarray(g) != 0.0)
             for g in jax.tree_util.tree_leaves(reg_grads)), \
      "PriorRegressor receives no gradient — the prior is effectively fixed"

  # the KL term differs between supervised labelings once locs differ
  shifted = jax.tree_util.tree_map(lambda a: a, params)
  shifted["vae"]["regressor"]["diag_loc_true"] = \
      params["vae"]["regressor"]["diag_loc_true"] + 1.0
  x, y, mask = batch
  ones = np.ones_like(mask)
  _, kl_a, _ = model.elbo_components(shifted, (x, y, ones), KEY, 0,
                                     training=False)
  _, kl_b, _ = model.elbo_components(shifted, (x, y[:, ::-1].copy(), ones),
                                     KEY, 0, training=False)
  assert not np.allclose(np.asarray(kl_a["kl_denotations"]),
                         np.asarray(kl_b["kl_denotations"])), \
      "p(z_c|y) does not depend on y"


def test_reparams_m3_encode_decode_roundtrip():
  """Host-facing encode/decode must work for reparamsM3VAE: M3 never
  traces M2's encode_xy modules (their params don't exist), so encode()
  must return the joint [z, z_c] posterior whose width matches what
  decode_zy consumes (regression: ScopeParamNotFoundError in x_to_qz,
  then a width mismatch in z_to_px)."""
  model, batch_fn = _build_model(reparamsM3VAE)
  x = jnp.asarray(batch_fn()[0])
  qz = model.encode(x, jit=False)
  zdim_joint = model.zdim + model.n_classes
  assert qz.event_shape == (zdim_joint,), qz.event_shape
  px = model.decode(qz.mean())
  assert px.mean().shape == x.shape
  # the M2 parent keeps its own conditional encode path working too
  m2, batch_fn2 = _build_model(M2VAE)
  x2 = jnp.asarray(batch_fn2()[0])
  q2 = m2.encode(x2, jit=False)
  p2 = m2.decode(q2.mean())
  assert p2.mean().shape == x2.shape
