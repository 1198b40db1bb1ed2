"""End-to-end slice: get_networks -> VariationalAutoencoder -> fit
(SURVEY.md §7 stage 4). Runs on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from odin_tpu.networks import get_networks, get_optimizer_info
from odin_tpu.bay.vi import VariationalAutoencoder, Autoencoder, get_vae


RNG = np.random.RandomState(8)


def synth_images(n=256, shape=(28, 28, 1)):
  return (RNG.rand(n, *shape) < 0.3).astype("float32")


def batches(X, n_steps, batch_size=32):
  for _ in range(n_steps):
    yield X[RNG.randint(0, len(X), batch_size)]


def test_get_networks_all():
  for name in ["mnist", "fashionmnist", "cifar10", "dsprites", "shapes3d",
               "celeba", "halfmoons", "cortex", "pbmc"]:
    nets = get_networks(name, is_semi_supervised=True)
    assert {"encoder", "decoder", "latents", "observation",
            "labels"} <= set(nets)
  info = get_optimizer_info("mnist", batch_size=64)
  assert info["max_iter"] == int(55000 / 64 * 800)
  assert callable(info["learning_rate"])
  with pytest.raises(ValueError):
    get_networks("not_a_dataset")


@pytest.mark.slow  # real mnist conv arch: ~120s of compile; the default
# set keeps per-class learning assertions via test_zoo_execution (tiny nets)
def test_vae_fit_improves_elbo(tmp_path):
  nets = get_networks("mnist", zdim=16)
  vae = VariationalAutoencoder(**nets).build()
  X = synth_images()
  tr = vae.fit(batches(X, 40), max_iter=40, learning_rate=1e-3,
               logging_interval=1e9, verbose=False,
               logdir=str(tmp_path / "logs"))
  # first logged step vs a fresh eval after training
  first_loss = tr.history[0]["loss"]
  ev = vae.make_eval_fn(jit=False)
  m = jax.device_get(ev(jax.device_get(vae.state), X[:64]))
  assert np.isfinite(m["elbo"])
  assert float(m["loss"]) < first_loss, (float(m["loss"]), first_loss)
  # logs written
  logs = tr.read_logs()
  assert len(logs) >= 1


def test_vae_api_surface():
  nets = get_networks("mnist", zdim=8)
  vae = VariationalAutoencoder(**nets).build()
  X = synth_images(8)
  px, qz = vae(X)
  assert px.batch_shape == (8,)
  assert px.event_shape == (28, 28, 1)
  assert qz.batch_shape == (8,)
  assert qz.event_shape == (8,)
  # prior sampling + decode
  px2 = vae.sample_observation(n=3)
  assert px2.batch_shape == (3,)
  # traversal: 2 dims x 5 points x 2 inputs
  pxt = vae.sample_traverse(X[:2], feature_indices=[0, 1], n_traverse_points=5)
  assert pxt.batch_shape == (20,)
  iw, rec = vae.marginal_log_prob(X[:4], n_samples=5)
  assert iw.shape == (4,)
  assert np.all(np.asarray(iw) <= np.asarray(rec) + 50)
  # save / load round-trip
  import tempfile, os
  with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "w.pkl")
    md5 = vae.md5_checksum()
    vae.save_weights(p)
    vae2 = VariationalAutoencoder(**get_networks("mnist", zdim=8)).build()
    vae2.load_weights(p)
    assert vae2.md5_checksum() == md5


def test_autoencoder_baseline():
  nets = get_networks("halfmoons", zdim=2)
  ae = Autoencoder(**nets).build()
  X = RNG.randn(128, 2).astype("f")
  tr = ae.fit(batches(X, 30, 16), max_iter=30, verbose=False,
              logging_interval=1e9)
  assert np.isfinite(tr.history[-1]["loss"])


def test_get_vae_registry():
  assert get_vae("vae") is VariationalAutoencoder
  assert get_vae("autoencoder") is Autoencoder
  assert len(get_vae()) >= 2
  with pytest.raises(ValueError):
    get_vae("definitely_missing")


def test_train_params_nested_partition_freeze():
  """`fit(train_params=('vae/decoder', ...))` must update exactly the named
  subtrees and freeze every sibling (reference `encoder.trainable = False`
  two-phase finetune, ``betavae_encoder_info_bound.py:125-134``)."""
  from odin_tpu.bay.vi import BetaVAE

  vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  p0 = jax.device_get(vae.state.params)
  X = RNG.rand(256, 2).astype("float32")
  vae.fit_device_dataset(X, n_steps=20, batch_size=64, learning_rate=1e-2,
                         steps_per_call=10, seed=0, verbose=False,
                         train_params=("vae/decoder", "vae/observation"))
  p1 = jax.device_get(vae.state.params)

  def maxdiff(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

  assert maxdiff(p0["vae"]["encoder"], p1["vae"]["encoder"]) == 0.0
  assert maxdiff(p0["vae"]["latents"], p1["vae"]["latents"]) == 0.0
  assert maxdiff(p0["vae"]["decoder"], p1["vae"]["decoder"]) > 0.0
  assert maxdiff(p0["vae"]["observation"], p1["vae"]["observation"]) > 0.0


def test_vqvae_ema_codebook_updates():
  """EMA VQ-VAE (van den Oord 2017 app. A.1): the codebook is a mutable
  collection updated in-graph by cluster-count/mean EMAs, not a gradient
  param — training must move it, keep counts positive, and the loss must
  stay finite (reference `vq_vae.py:153-186`)."""
  from odin_tpu.bay.vi import get_vae

  vae = get_vae("vqvae")(n_codes=16, ema=True,
                         **get_networks("halfmoons", zdim=4)).build(seed=0)
  cb0 = np.asarray(vae.state.mutables["vq_stats"]["latents"]["codebook"])
  X = RNG.rand(256, 2).astype("float32")
  vae.fit_device_dataset(X, n_steps=30, batch_size=64, learning_rate=1e-3,
                         steps_per_call=10, seed=0, verbose=False)
  llk, kl, _ = vae.elbo_components(vae.state.params, X[:64],
                                   jax.random.PRNGKey(0), 0, False,
                                   vae.state.mutables)
  assert all(np.all(np.isfinite(np.asarray(v)))
             for v in {**llk, **kl}.values())
  cb1 = np.asarray(vae.state.mutables["vq_stats"]["latents"]["codebook"])
  counts = np.asarray(vae.state.mutables["vq_stats"]["latents"]["counts"])
  assert float(np.max(np.abs(cb1 - cb0))) > 1e-5
  assert np.all(np.isfinite(cb1)) and np.all(counts > 0)
  # discrete surface: x -> indices -> px round trip
  idx = vae.encode_codes(X[:8])
  assert idx.shape == (8,) or idx.shape[0] == 8
  px = vae.decode_codes(np.asarray(idx))
  assert np.all(np.isfinite(np.asarray(px.mean())))


def test_grad_accumulation_matches_full_batch():
  """`make_step_fn(accum_steps=k)` scans k microbatches and applies ONE
  averaged update — for a mean-reduced, rng-independent loss this must be
  numerically the full-batch step (standard way to fit an N×-larger
  effective batch in fixed HBM; no reference counterpart —
  `base_networks.py:490` always consumes the whole batch)."""
  X = RNG.rand(64, 2).astype("float32")

  def one_step(accum):
    vae = Autoencoder(**get_networks("halfmoons", zdim=2)).build(seed=0)
    fn = vae.make_step_fn(learning_rate=1e-2, accum_steps=accum)
    state0 = jax.device_get(vae.state)  # AFTER make_step_fn (opt_states)
    state1, metrics = fn(state0, X)
    return jax.device_get(state1.params), jax.device_get(metrics)

  p_full, m_full = one_step(1)
  p_acc, m_acc = one_step(4)
  for a, b in zip(jax.tree_util.tree_leaves(p_full),
                  jax.tree_util.tree_leaves(p_acc)):
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(m_full["loss"], m_acc["loss"],
                             rtol=1e-5, atol=1e-5)


def test_mixed_precision_bf16_training():
  """`make_step_fn(compute_dtype=bf16)` runs forward/backward in bfloat16
  (the MXU-native path) while master params, grads, and Adam moments stay
  fp32 — params must remain float32, the loss must be finite fp32, and the
  model must still learn."""
  from odin_tpu.bay.vi import BetaVAE

  vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  fn = vae.make_step_fn(learning_rate=1e-2, compute_dtype=jnp.bfloat16)
  state = jax.device_get(vae.state)
  X = RNG.rand(512, 2).astype("float32")
  losses = []
  for i in range(30):
    state, metrics = fn(state, X[RNG.randint(0, len(X), 64)])
    losses.append(float(metrics["loss"]))
  assert all(np.isfinite(losses))
  assert np.asarray(metrics["loss"]).dtype == np.float32
  for leaf in jax.tree_util.tree_leaves(jax.device_get(state.params)):
    assert leaf.dtype == np.float32, leaf.dtype
  assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.slow  # two extra step-fn compiles
def test_params_ema_polyak_averaging():
  """`make_step_fn(ema_decay=d)` tracks a Polyak average of the params in
  the state (checkpointed with it); `use_ema_params` swaps it in for eval.
  d=0 must equal the raw params; d in (0,1) must trail them."""
  from odin_tpu.training.core import use_ema_params, EMA_KEY
  from odin_tpu.bay.vi import BetaVAE

  X = RNG.rand(256, 2).astype("f")
  vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  fn = vae.make_step_fn(learning_rate=1e-2, ema_decay=0.9)
  state = jax.device_get(vae.state)
  p0 = state.params
  for _ in range(10):
    state, _ = fn(state, X[RNG.randint(0, 256, 64)])
  ema_state = use_ema_params(jax.device_get(state))
  leaves = lambda t: jax.tree_util.tree_leaves(t)
  d_raw = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(leaves(state.params), leaves(ema_state.params)))
  assert d_raw > 1e-6  # EMA trails the raw params
  # EMA lies between init and raw (a convex trail), and eval works with it
  ev = vae.make_eval_fn(jit=False)
  m = jax.device_get(ev(ema_state, X[:64]))
  assert np.isfinite(m["loss"])
  # d=0 degenerates to the raw params exactly
  vae2 = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  fn2 = vae2.make_step_fn(learning_rate=1e-2, ema_decay=0.0)
  s2 = jax.device_get(vae2.state)
  s2, _ = fn2(s2, X[:64])
  for a, b in zip(leaves(s2.params), leaves(s2.opt_states[EMA_KEY])):
    np.testing.assert_allclose(a, b, atol=0)
  with pytest.raises(ValueError):
    use_ema_params(jax.device_get(vae.state).replace(opt_states={}))


def test_remat_step_matches_plain():
  """`make_step_fn(remat=True)` wraps the loss in `jax.checkpoint`: the
  backward pass recomputes forward activations instead of keeping them in
  HBM (the standard TPU FLOPs-for-memory lever; no reference counterpart —
  TF's recompute_grad is never used there).  The recomputation re-executes
  the identical primitives, so one update must match the plain step, for
  both remat=True (save nothing) and a named checkpoint policy."""
  from odin_tpu.bay.vi import BetaVAE

  X = RNG.rand(64, 2).astype("float32")

  def one_step(remat):
    vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
    fn = vae.make_step_fn(learning_rate=1e-2, remat=remat)
    state0 = jax.device_get(vae.state)
    state1, metrics = fn(state0, X)
    return jax.device_get(state1.params), jax.device_get(metrics)

  p_plain, m_plain = one_step(False)
  for remat in (True, "dots_saveable"):
    p_r, m_r = one_step(remat)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_r)):
      np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(m_plain["loss"], m_r["loss"],
                               rtol=1e-6, atol=1e-6)


def test_remat_composes_with_accum_and_bf16():
  """remat must compose with gradient accumulation (checkpoint inside each
  microbatch) and the bf16 compute policy — finite decreasing loss, fp32
  params."""
  from odin_tpu.bay.vi import BetaVAE

  X = RNG.rand(512, 2).astype("float32")
  vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  fn = vae.make_step_fn(learning_rate=1e-2, remat=True, accum_steps=4,
                        compute_dtype=jnp.bfloat16)
  state = jax.device_get(vae.state)
  losses = []
  for _ in range(25):
    state, metrics = fn(state, X[RNG.randint(0, len(X), 64)])
    losses.append(float(metrics["loss"]))
  assert all(np.isfinite(losses))
  assert np.mean(losses[-5:]) < np.mean(losses[:5])
  assert all(l.dtype == np.float32
             for l in jax.tree_util.tree_leaves(jax.device_get(state.params)))


@pytest.mark.slow  # two conv-model step-fn compiles
def test_remat_recomputes_forward_in_compiled_program():
  """The rematerialized conv step's COMPILED program must actually contain
  the forward recompute: its flop count exceeds the plain step's (the
  backward re-runs the forward instead of reading stored activations) and
  the StableHLO carries the optimization barrier that stops XLA from
  CSE-ing the duplicate away.  (Peak-memory effect is scheduler/backend
  dependent — XLA CPU's temp arena does not shrink — so the HBM claim is
  measured on the TPU in benchmarks/remat_bench.py, not asserted here.)"""
  from odin_tpu.bay.vi import BetaVAE

  X = jnp.asarray((RNG.rand(128, 64, 64, 1) < 0.5).astype("float32"))

  def compile_stats(remat):
    vae = BetaVAE(beta=1.0, **get_networks("dsprites", zdim=10)).build(seed=0)
    fn = vae.make_step_fn(learning_rate=1e-3, remat=remat, jit=False)
    state = jax.device_get(vae.state)
    lowered = jax.jit(fn).lower(state, X)
    n_barriers = lowered.as_text().count("optimization_barrier")
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
      cost = cost[0]
    return float(cost.get("flops", 0.0)), n_barriers

  flops_plain, nb_plain = compile_stats(False)
  flops_remat, nb_remat = compile_stats(True)
  assert nb_plain == 0 and nb_remat >= 1
  assert flops_remat > 1.1 * flops_plain, (flops_plain, flops_remat)


def test_fit_device_dataset_checkpoint_resume(tmp_path):
  """`fit_device_dataset(checkpoint_path=..., checkpoint_freq=...)` writes
  full-TrainState pickles inside the compiled loop (params + optimizer
  moments + step), and `load_weights` + `keep_opt_states=True` resumes the
  run exactly where it stopped — the crash-recovery path of the round-4
  full-grid benchmark runner (results/run_r4_fullgrid.py)."""
  from odin_tpu.bay.vi import BetaVAE

  X = RNG.rand(256, 2).astype("float32")
  ck = str(tmp_path / "ck.pkl")

  def build():
    return BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(
        seed=0)

  # interrupted run: 40 of 60 steps, checkpoints every 20
  v1 = build()
  v1.fit_device_dataset(X, n_steps=40, batch_size=32, steps_per_call=10,
                        checkpoint_path=ck, checkpoint_freq=20, seed=3,
                        verbose=False)
  # resume: the checkpoint restores step AND Adam moments
  v2 = build()
  v2.load_weights(ck)
  assert int(v2.state.step) == 40
  assert v2.state.opt_states
  m0 = jax.tree_util.tree_leaves(v2.state.opt_states)
  assert any(float(jnp.max(jnp.abs(l))) > 0 for l in m0
             if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))
  v2.fit_device_dataset(X, n_steps=20, batch_size=32, steps_per_call=10,
                        keep_opt_states=True, checkpoint_path=ck,
                        checkpoint_freq=20, seed=3, verbose=False)
  assert int(v2.state.step) == 60
  # the final checkpoint was refreshed at the end of the resumed run
  v3 = build().load_weights(ck)
  assert int(v3.state.step) == 60


def test_fit_device_dataset_pair_sample_fn():
  """`fit_device_dataset(sample_fn=...)` routes batch construction through a
  custom in-graph sampler — the Ada-GVAE full-grid path gathers (x1, x2)
  pairs from a (uint8 corpus, pair-index) structure whose leaves have
  different leading axes (results/run_r4_fullgrid.py)."""
  from odin_tpu.bay.vi import AdaptiveVAE

  corpus = (RNG.rand(128, 2) * 255).astype(np.uint8)
  pairs = np.stack([RNG.randint(0, 128, 500),
                    RNG.randint(0, 128, 500)], -1).astype(np.int32)

  def sample_fn(key, data):
    grid_u8, pr = data
    idx = jax.random.randint(key, (16,), 0, pr.shape[0])
    p = pr[idx]
    x1 = grid_u8[p[:, 0]].astype(jnp.float32) / 255.0
    x2 = grid_u8[p[:, 1]].astype(jnp.float32) / 255.0
    return (x1, x2)

  vae = AdaptiveVAE(**get_networks("halfmoons", zdim=2)).build(seed=0)
  vae.fit_device_dataset((corpus, pairs), n_steps=20, batch_size=16,
                         steps_per_call=10, sample_fn=sample_fn, seed=1,
                         verbose=False)
  assert int(vae.state.step) == 20
  assert all(np.isfinite(np.ravel(l)).all()
             for l in jax.tree_util.tree_leaves(
                 jax.device_get(vae.state.params)))


def test_fullgrid_build_pairs_protocol():
  """The full-grid Ada-GVAE pair builder (results/run_r4_fullgrid.py):
  every pair has BOTH members inside the 90% train split and differs in
  EXACTLY one factor (n_changed=1, Locatello et al. 2020)."""
  import importlib.util
  import os
  spec = importlib.util.spec_from_file_location(
      "run_r4_fullgrid",
      os.path.join(os.path.dirname(__file__), "..", "results",
                   "run_r4_fullgrid.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)

  class TinyGrid:
    factor_sizes = [3, 4, 5]
    seed = 1

    def grid_factors(self):
      return np.indices(self.factor_sizes).reshape(
          len(self.factor_sizes), -1).T.astype(np.int64)

  ds = TinyGrid()
  pairs = mod.build_pairs(ds, n_pairs=2000, seed=5)
  assert pairs.shape == (2000, 2) and pairs.dtype == np.int32
  total = int(np.prod(ds.factor_sizes))
  train = set(np.random.RandomState(ds.seed).permutation(total)
              [:int(0.9 * total)].tolist())
  grid = ds.grid_factors()
  assert set(pairs.ravel().tolist()) <= train
  diff = (grid[pairs[:, 0]] != grid[pairs[:, 1]]).sum(1)
  assert np.all(diff == 1)
