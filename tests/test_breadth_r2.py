"""Round-2 breadth components: backend losses, structured dropout,
distribution util layers, GradeMembershipModel, audio augmentation, and the
utils additions (np_utils / OrderedFlag / decorators).

Reference files: ``odin/backend/losses.py``, ``odin/networks/dropout.py``,
``odin/bay/layers/distribution_util_layers.py``,
``odin/bay/mixed_membership/grade_membership_model.py``,
``odin/preprocessing/audio/audio.py``, ``odin/utils/{np_utils,ordered_flag,
decorators}.py``.
"""
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# backend.losses
# ---------------------------------------------------------------------------
def test_contrastive_loss_semantics():
  from odin_tpu.backend import contrastive_loss
  # similar pairs at zero distance, dissimilar beyond the margin: zero loss
  y = np.array([1.0, 1.0, 0.0, 0.0])
  d = np.array([0.0, 0.0, 2.0, 1.5])
  assert float(contrastive_loss(y, d, margin=1.0)) == pytest.approx(0.0)
  # similar pair far apart is penalized quadratically
  assert float(contrastive_loss([1.0], [2.0])) == pytest.approx(4.0)
  # dissimilar pair inside the margin
  assert float(contrastive_loss([0.0], [0.25], margin=1.0)) == \
      pytest.approx(0.75 ** 2)


def test_triplet_loss_semantics():
  from odin_tpu.backend import triplet_loss
  a = np.zeros((4, 3), "f")
  pos = a + 0.1
  neg = a + 10.0
  assert float(triplet_loss(a, pos, neg, margin=1.0)) == pytest.approx(0.0)
  # negative closer than positive: loss > margin
  assert float(triplet_loss(a, neg, pos, margin=1.0)) > 1.0


def test_cosine_similarity_matrix():
  from odin_tpu.backend import cosine_similarity
  t = np.array([[1.0, 0.0], [0.0, 2.0]], "f")
  p = np.array([[3.0, 0.0], [0.0, 0.5], [1.0, 1.0]], "f")
  scores = np.asarray(cosine_similarity(t, p))
  assert scores.shape == (2, 3)
  assert scores[0, 0] == pytest.approx(1.0, abs=1e-6)
  assert scores[1, 1] == pytest.approx(1.0, abs=1e-6)
  assert scores[0, 2] == pytest.approx(1 / np.sqrt(2), abs=1e-5)
  pair = np.asarray(cosine_similarity(t, t, one_vs_all=False))
  assert pair.shape == (2, 1)
  np.testing.assert_allclose(pair, 0.0, atol=1e-6)


def test_bayes_crossentropy_balanced_equals_plain_ce():
  from odin_tpu.backend import bayes_crossentropy
  rng = np.random.RandomState(0)
  # balanced batch: prior = 1/C and the 1/C scaling cancels -> plain CE
  y = np.eye(4, dtype="f")[np.array([0, 1, 2, 3, 0, 1, 2, 3])]
  logits = rng.randn(8, 4).astype("f")
  p = np.asarray(jax.nn.softmax(logits))
  plain = -np.mean(np.sum(y * np.log(p), -1))
  assert float(bayes_crossentropy(y, p)) == pytest.approx(plain, rel=1e-5)


def test_bayes_crossentropy_imbalance_invariant():
  from odin_tpu.backend import bayes_crossentropy
  # the whole point of the prior weighting: with an identical prediction
  # everywhere, the loss is INVARIANT to class imbalance (each class
  # contributes its own log-prob once), while plain CE drifts toward the
  # majority class's term
  p = np.tile(np.array([[0.7, 0.3]], "f"), (8, 1))
  imbalanced = np.eye(2, dtype="f")[np.array([0] * 7 + [1])]
  balanced = np.eye(2, dtype="f")[np.array([0] * 4 + [1] * 4)]
  b1 = float(bayes_crossentropy(imbalanced, p))
  b2 = float(bayes_crossentropy(balanced, p))
  assert b1 == pytest.approx(b2, rel=1e-5)
  assert b1 == pytest.approx(-(np.log(0.7) + np.log(0.3)) / 2, rel=1e-4)
  plain = lambda y: -np.mean(np.sum(y * np.log(p), -1))
  assert plain(imbalanced) != pytest.approx(plain(balanced), rel=1e-3)


def test_regularizers_finite():
  from odin_tpu.backend import (correntropy_regularize, jacobian_regularize,
                                bayes_binary_crossentropy)
  rng = np.random.RandomState(1)
  h = 1 / (1 + np.exp(-rng.randn(8, 5)))  # sigmoid activations
  w = rng.randn(3, 5)
  jac = float(jacobian_regularize(h, w))
  assert np.isfinite(jac) and jac > 0
  corr = float(correntropy_regularize(rng.randn(8, 5)))
  assert np.isfinite(corr) and corr < 0
  bce = float(bayes_binary_crossentropy(np.array([0, 1, 1, 0]),
                                        np.array([0.1, 0.9, 0.8, 0.2], "f")))
  assert np.isfinite(bce) and bce > 0


# ---------------------------------------------------------------------------
# networks.dropout
# ---------------------------------------------------------------------------
def test_discrete_dropout_thins_counts():
  from odin_tpu.networks import DiscreteDropout
  x = jnp.full((2000,), 10.0)
  layer = DiscreteDropout(dropout_rate=0.5, corrupt_rate=0.3)
  y = layer.apply({}, x, training=True, rngs={"dropout": KEY})
  y = np.asarray(y)
  assert y.shape == x.shape
  # corrupted entries are Binomial(10, 0.7) draws: integers <= original
  assert np.all(y <= 10.0) and np.all(y >= 0.0)
  changed = np.mean(y < 10.0)
  assert 0.3 < changed < 0.7  # ~dropout_rate of entries thinned
  # expected value: 0.5*10 + 0.5*7 = 8.5
  assert 7.5 < y.mean() < 9.5
  # eval: identity
  y_eval = layer.apply({}, x, training=False)
  np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))


def test_dropblock_structure():
  from odin_tpu.networks import DropBlock
  x = jnp.ones((2, 16, 16, 4))
  layer = DropBlock(rate=0.2, blocksize=4)
  y = np.asarray(layer.apply({}, x, training=True, rngs={"dropout": KEY}))
  assert y.shape == x.shape
  dropped = np.mean(y == 0.0)
  assert 0.02 < dropped < 0.6
  # survivors are rescaled above 1 so the expected activation is preserved
  survivors = y[y > 0]
  assert np.all(survivors > 1.0)
  assert np.mean(y) == pytest.approx(1.0, rel=0.25)
  np.testing.assert_array_equal(
      np.asarray(layer.apply({}, x, training=False)), np.asarray(x))


# ---------------------------------------------------------------------------
# bay.layers util layers
# ---------------------------------------------------------------------------
def test_distribution_util_layers():
  from odin_tpu.bay.distributions import (ConditionalTensor, Independent,
                                          Normal)
  from odin_tpu.bay.layers import (ConditionalTensorLayer, DistributionAttr,
                                   Moments, Sampling, Stddev)
  dist = Normal(jnp.arange(6.0).reshape(2, 3), jnp.full((2, 3), 0.5))

  s = Sampling(sample_shape=(4,)).apply({}, dist, rngs={"sample": KEY})
  assert s.shape == (4, 2, 3)
  # plain tensors pass through with prepended sample dims
  t = Sampling(sample_shape=(4,)).apply({}, jnp.zeros((2, 3)),
                                        rngs={"sample": KEY})
  assert t.shape == (1, 2, 3)

  m, v = Moments().apply({}, dist)
  np.testing.assert_allclose(np.asarray(m), np.asarray(dist.mean()))
  np.testing.assert_allclose(np.asarray(v), 0.25, rtol=1e-6)
  assert Moments(variance=False).apply({}, dist).shape == (2, 3)

  sd = Stddev().apply({}, dist)
  np.testing.assert_allclose(np.asarray(sd), 0.5, rtol=1e-6)
  # identity on tensors
  assert Stddev().apply({}, jnp.ones((2,))).shape == (2,)

  attr = DistributionAttr(attr_name="mean").apply({}, dist)
  np.testing.assert_allclose(np.asarray(attr), np.asarray(dist.mean()))

  # event-shaped base: statistics (2, 3) + condition (2, 2) -> (2, 5)
  ev = Independent(dist, 1)
  cond = ConditionalTensorLayer().apply({}, (ev, jnp.ones((2, 2))))
  assert isinstance(cond, ConditionalTensor)
  assert cond.mean().shape == (2, 5)


# ---------------------------------------------------------------------------
# GradeMembershipModel
# ---------------------------------------------------------------------------
def _gom_data():
  rng = np.random.RandomState(0)
  Q, A, K = 6, 4, 3
  # planted profiles: profile k answers question q with (k + q) % A
  profiles = (np.arange(K)[:, None] + np.arange(Q)[None, :]) % A
  members = rng.randint(0, K, size=256)
  answers = profiles[members]
  noise = rng.rand(256, Q) < 0.1
  answers = np.where(noise, rng.randint(0, A, size=(256, Q)), answers)
  return Q, A, K, answers


@pytest.mark.slow
def test_grade_membership_model_executes():
  from odin_tpu.bay.mixed_membership import GradeMembershipModel
  Q, A, K, answers = _gom_data()
  model = GradeMembershipModel(n_questions=Q, n_answers=A, n_components=K,
                               encoder_layers=(16,)).build(seed=0)
  llk, kl, aux = model.elbo_components(
      model.state.params, jnp.asarray(answers[:32]), KEY, 0)
  assert llk["llk_answers"].shape == (32,)
  assert kl["kl_profiles"].shape == (32,)
  assert np.all(np.isfinite(np.asarray(llk["llk_answers"])))
  assert np.all(np.isfinite(np.asarray(kl["kl_profiles"])))
  assert model.transform(answers[:4], per_question=True).shape == (4, Q, K)
  assert model.get_profiles().shape == (Q, K, A)


@pytest.mark.slow
def test_grade_membership_model_learns():
  from odin_tpu.bay.mixed_membership import GradeMembershipModel
  Q, A, K, answers = _gom_data()
  model = GradeMembershipModel(n_questions=Q, n_answers=A, n_components=K,
                               encoder_layers=(16,),
                               warmup_steps=150).build(seed=0)
  step = model.make_step_fn(learning_rate=3e-2)
  state = model.state
  batch = jnp.asarray(answers)
  losses = []
  for _ in range(300):
    state, m = step(state, batch)
    losses.append(float(m["loss"]))
  assert np.all(np.isfinite(losses))
  assert losses[-1] < losses[0] - 0.1, losses[::50]
  model.state = jax.device_get(state)

  # reconstruction of the planted answers beats chance by a wide margin
  # (without the KL warm-up, training stalls in the collapsed optimum that
  # predicts each question's marginal: acc ~0.34, see the model docstring)
  pred = model.predict(answers[:128])
  acc = float(np.mean(pred == answers[:128]))
  assert acc > 0.7, acc  # chance = 0.25

  theta = model.transform(answers[:16])
  assert theta.shape == (16, K)
  np.testing.assert_allclose(theta.sum(-1), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# preprocessing.audio
# ---------------------------------------------------------------------------
def test_time_stretch_changes_duration():
  from odin_tpu.preprocessing.audio import time_stretch
  sr = 8000
  t = np.arange(8192) / sr
  y = np.sin(2 * np.pi * 440 * t).astype("f")
  fast = time_stretch(y, 2.0, frame_length=1024)
  slow = time_stretch(y, 0.5, frame_length=1024)
  assert abs(len(fast) - len(y) / 2) < 1024
  assert abs(len(slow) - len(y) * 2) < 1024
  # tempo change must not move the pitch
  f_peak = np.abs(np.fft.rfft(fast * np.hanning(len(fast))))
  freq = np.fft.rfftfreq(len(fast), 1 / sr)[np.argmax(f_peak)]
  assert abs(freq - 440) < 30, freq


def test_pitch_shift_moves_frequency():
  from odin_tpu.preprocessing.audio import pitch_shift
  sr = 8000
  t = np.arange(8192) / sr
  y = np.sin(2 * np.pi * 440 * t).astype("f")
  up = pitch_shift(y, sr, n_steps=12, bins_per_octave=12,
                   frame_length=1024)
  assert len(up) == len(y)
  spec = np.abs(np.fft.rfft(up * np.hanning(len(up))))
  freq = np.fft.rfftfreq(len(up), 1 / sr)[np.argmax(spec)]
  assert abs(freq - 880) < 60, freq


def test_augment_audio_deterministic():
  from odin_tpu.preprocessing.audio import augment_audio
  rng = np.random.RandomState(2)
  y = rng.randn(4096).astype("f")
  mods = augment_audio(y, 8000, n_augment=2, seed=7)
  assert len(mods) == 3
  np.testing.assert_array_equal(mods[0], y)
  for m in mods[1:]:
    assert m.shape == y.shape and np.isfinite(m).all()
    assert not np.array_equal(m, y)
  mods2 = augment_audio(y, 8000, n_augment=2, seed=7)
  for a, b in zip(mods, mods2):
    np.testing.assert_array_equal(a, b)


def test_logscale_spec():
  from odin_tpu.preprocessing.audio import logscale_spec
  rng = np.random.RandomState(3)
  spec = rng.rand(10, 64)
  warped, freqs = logscale_spec(spec, sr=8000)
  assert warped.shape == (10, 64)
  assert len(freqs) == 64
  # total energy is conserved by the two-bin scatter
  assert np.abs(warped.sum() - spec.sum()) < 1e-6 * spec.sum() + 1e-8


# ---------------------------------------------------------------------------
# utils: np_utils / OrderedFlag / decorators
# ---------------------------------------------------------------------------
def test_array_bytes_roundtrip():
  from odin_tpu.utils import array2bytes, bytes2array
  for arr in (np.arange(12, dtype="int64").reshape(3, 4),
              np.random.RandomState(0).randn(2, 3, 5).astype("f"),
              np.array(["ab", "cd"], dtype="<U2").view(np.uint32).reshape(2, 2)):
    out = bytes2array(array2bytes(arr))
    np.testing.assert_array_equal(out, arr)
    assert out.dtype == arr.dtype


def test_one_hot_and_labels():
  from odin_tpu.utils import label_splitter, one_hot, unique_labels
  y = np.array([0, 2, -1, 1])
  oh = one_hot(y, nb_classes=3)
  np.testing.assert_array_equal(oh[2], 0.0)  # negative index -> zero row
  np.testing.assert_array_equal(oh[:2].argmax(-1), [0, 2])

  idx, labels = unique_labels(["b", "a", "b", "c"], return_labels=True)
  assert labels == ("a", "b", "c")
  assert [idx(i) for i in ["a", "b", "c"]] == [0, 1, 2]
  with pytest.raises(ValueError):
    idx("zz")

  split = label_splitter(0, "/")
  assert split("spk1/utt3") == "spk1"
  assert pickle.loads(pickle.dumps(split))("spk9/x") == "spk9"


def test_ordered_flag_algebra():
  from odin_tpu.utils import OrderedFlag

  class Mode(OrderedFlag):
    a = "a"
    b = "b"
    c = "c"

  ab = Mode.a | Mode.b
  ba = Mode.b | Mode.a
  assert ab == ba                      # order-insensitive equality
  assert ab.value == "a_b" and ba.value == "b_a"  # order preserved in value
  assert Mode.a in ab and Mode.c not in ab
  assert (ab & Mode.b) == Mode.b
  assert (ab ^ Mode.b) == Mode.a
  assert (~Mode.c) == ab
  assert list(ba) == [Mode.b, Mode.a]
  assert ba[0] == Mode.b and ba.index(Mode.a) == 1


def test_decorators():
  from odin_tpu.utils import (autoattr, functionable, schedule, singleton,
                              typecheck)

  calls = []

  @schedule(interval=10.0)
  def tick(v):
    calls.append(v)
    return v

  assert tick(1) is None  # inside the interval since decoration time
  assert calls == []

  @typecheck
  def add(a: int, b: int) -> int:
    return a + b

  assert add(1, 2) == 3
  with pytest.raises(TypeError):
    add(1, "x")

  class Model:
    fitted = False

    @autoattr(fitted=True)
    def fit(self):
      return self

  m = Model()
  m.fit()
  assert m.fitted is True

  scale = 3
  f = functionable(lambda x: scale * x + offset)
  globals()["offset"] = 10
  restored = pickle.loads(pickle.dumps(f))
  assert restored(2) == 16

  @singleton
  class Config:
    def __init__(self, name):
      self.name = name

  assert Config("x") is Config("x")
  assert Config("x") is not Config("y")


# ---------------------------------------------------------------------------
# HumanGenome + pdf utils (local-gated surfaces)
# ---------------------------------------------------------------------------
def test_human_genome_table(tmp_path):
  from odin_tpu.fuel import HumanGenome
  from odin_tpu.fuel.bio_data import _HGNC_HEADER
  # synthesize one chromosome file in the exact HGNC cache format
  rows = [
      dict(symbol="PTPRC", name="protein tyrosine phosphatase receptor C",
           ensembl_gene_id="ENSG00000081237", locus_type="gene with protein "
           "product", cd="CD45", uniprot_ids="P08575", location="1q31.3"),
      dict(symbol="CD4", name="CD4 molecule", ensembl_gene_id=
           "ENSG00000010610", locus_type="gene with protein product",
           cd="CD4", uniprot_ids="P01730", location="12p13.31"),
      dict(symbol="MIR1-1", name="microRNA 1-1", ensembl_gene_id=
           "ENSG00000199017", locus_type="RNA, micro", cd="",
           uniprot_ids="", location="20q13.33"),
  ]
  lines = ["\t".join(_HGNC_HEADER)]
  for r in rows:
    lines.append("\t".join(r.get(c, "") for c in _HGNC_HEADER))
  (tmp_path / "protein-coding_gene_chr_1.txt").write_text("\n".join(lines))
  hg = HumanGenome(path=str(tmp_path))
  assert hg.db.shape[0] == 3
  assert hg.get_gene_symbol("CD45") == "PTPRC"
  assert hg.get_gene_id("CD4") == "ENSG00000010610"
  assert hg.get_chromosome("PTPRC") == "1"
  assert hg.is_cd_gene("PTPRC") and not hg.is_cd_gene("MIR1-1")
  assert "PTPRC" in hg and "NOPE" not in hg
  sub = hg[{"locus_type": "RNA, micro"}]
  assert sub.shape[0] == 1 and sub["symbol"].iloc[0] == "MIR1-1"
  assert "symbol" in hg.unique_index and "PTPRC" in hg.unique("symbol")


def test_pdf_title_and_rename(tmp_path):
  from odin_tpu.utils import get_pdf_titles, rename_pdf, sanitize_title
  assert sanitize_title("A\nTitle / With\\Slashes  ") == \
      "A Title . With.Slashes"
  assert sanitize_title("untitled") is None and sanitize_title("") is None
  # minimal uncompressed PDF with an info /Title
  pdf = (b"%PDF-1.4\n1 0 obj\n<< /Title (Deep Latent Models) >>\nendobj\n"
         b"trailer\n<< /Info 1 0 R >>\n%%EOF")
  f = tmp_path / "paper1.pdf"
  f.write_bytes(pdf)
  (tmp_path / "noinfo.pdf").write_bytes(b"%PDF-1.4\n%%EOF")
  titles = get_pdf_titles(str(tmp_path))
  assert titles[str(f)] == "Deep Latent Models"
  assert titles[str(tmp_path / "noinfo.pdf")] is None
  stats = rename_pdf(str(tmp_path), verbose=False)
  assert stats == {"ignored": 1, "renamed": 1}
  assert (tmp_path / "Deep Latent Models.pdf").exists()


def test_python_utils_containers():
  from odin_tpu.utils import (IndexedList, bidict, defaultdictkey, fifodict,
                              is_number, is_primitive, multikeysdict,
                              partialclass, struct)
  s = struct(a=1)
  s.b = 2
  s["c"] = 3
  assert (s.a, s["b"], s.c) == (1, 2, 3)
  with pytest.raises(AttributeError):
    _ = s.nope

  b = bidict(x=1)
  b["y"] = 2
  assert b[1] == "x" and b["y"] == 2 and b.inv[2] == "y"
  del b["x"]
  assert 1 not in b.inv

  d = defaultdictkey(lambda k: k * 2)
  assert d["ab"] == "abab" and "ab" in d

  f = fifodict(maxlen=2)
  f["a"], f["b"], f["c"] = 1, 2, 3
  assert "a" not in f and list(f) == ["b", "c"]

  m = multikeysdict({("p", "q"): 7, "r": 8})
  assert m["p"] == m["q"] == 7 and m["r"] == 8

  class Point:
    def __init__(self, x, y=0):
      self.x, self.y = x, y

  P1 = partialclass(Point, y=5)
  assert P1(1).y == 5 and isinstance(P1(1), Point)

  lst = IndexedList()
  lst.append(10, name="ten")
  lst.append(20, name="twenty")
  assert lst["twenty"] == 20 and lst[0] == 10

  assert is_number(3.5) and not is_number(True)
  assert is_primitive((1, "a", None)) and not is_primitive(object())


@pytest.mark.slow
def test_checkpoint_resume_is_deterministic(tmp_path):
  """Mid-run checkpoint -> restore -> continue must reproduce the
  uninterrupted run EXACTLY (params bit-equal), including the on-device
  batch stream keyed by the global step (SURVEY §5 checkpoint/resume:
  deterministic resume is the failure-recovery story)."""
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.core import device_dataset_steps
  from odin_tpu.training.trainer import Trainer

  rng = np.random.RandomState(0)
  data = jnp.asarray(rng.randn(256, 2).astype("f"))

  def fresh():
    vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=3)
    raw = vae.make_step_fn(learning_rate=1e-3, jit=False)
    return vae, jax.jit(device_dataset_steps(raw, 32, 5, seed=7))

  # uninterrupted: 2 fused calls of 5 steps
  vae, fused = fresh()
  state = vae.state
  state, _ = fused(state, data)
  state, _ = fused(state, data)
  params_a = jax.device_get(state.params)

  # interrupted: 1 call, checkpoint, restore into a FRESH process-like
  # context (new model object + new compiled fn), 1 more call
  vae2, fused2 = fresh()
  state2, _ = fused2(vae2.state, data)
  tr = Trainer(logdir=str(tmp_path))
  ckpt = tr.save_checkpoint(state2)
  vae3, fused3 = fresh()
  restored = Trainer(logdir=str(tmp_path)).restore_checkpoint(ckpt)
  assert int(restored.step) == 5
  state3, _ = fused3(restored, data)
  params_b = jax.device_get(state3.params)

  for pa, pb in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


# ---------------------------------------------------------------------------
# long-tail surface: maths llr, search variants, ml/stats helpers, image
# affine ops, AudioAugmentor, SimpleRNN
# ---------------------------------------------------------------------------
def test_maths_llr_rms_poincare():
  from odin_tpu.backend import (poincare_normalize, renorm_rms, to_llh,
                                to_llr, to_sample_weights)
  rng = np.random.RandomState(0)
  p = np.abs(rng.rand(6, 4)) + 0.1
  llh = np.asarray(to_llh(p))
  np.testing.assert_allclose(np.exp(llh).sum(-1), 1.0, rtol=1e-5)
  llr = np.asarray(to_llr(jax.nn.softmax(jnp.asarray(rng.randn(6, 4)))))
  assert llr.shape == (6, 4) and np.isfinite(llr).all()
  # a dominant class has positive LLR, the others negative
  conf = to_llr(np.array([[0.97, 0.01, 0.01, 0.01]], "f"))
  assert float(conf[0, 0]) > 0 > float(conf[0, 1])
  x = rng.randn(5, 16).astype("f")
  r = np.asarray(renorm_rms(x, axis=1))
  np.testing.assert_allclose(np.sqrt((r ** 2).sum(1) / 16), 1.0, rtol=1e-5)
  z = np.asarray(poincare_normalize(rng.randn(8, 3) * 10))
  assert np.all(np.linalg.norm(z, axis=-1) <= 1.0)
  w = to_sample_weights(np.array([0, 1, 1]), np.array([0.5, 2.0]))
  np.testing.assert_allclose(np.asarray(w), [0.5, 2.0, 2.0])


def test_diagonal_search_variants_agree():
  from odin_tpu.search import (diagonal_beam_search,
                               diagonal_bruteforce_search,
                               diagonal_greedy_search,
                               diagonal_hillclimb_search)
  rng = np.random.RandomState(3)
  m = rng.rand(6, 6)

  def diag_sum(order):
    return sum(m[r, c] for c, r in enumerate(order[:6]))

  exact = diagonal_bruteforce_search(m)
  beam = diagonal_beam_search(m, beam_size=6)
  greedy = diagonal_greedy_search(m)
  hill = diagonal_hillclimb_search(m)
  for order in (exact, beam, greedy, hill):
    assert sorted(order) == list(range(6))
  assert diag_sum(exact) >= diag_sum(beam) - 1e-12
  assert diag_sum(exact) >= diag_sum(greedy) - 1e-12
  assert diag_sum(beam) >= diag_sum(hill) - 1e-12


def test_ml_dbscan_predict_and_naive_bayes():
  from odin_tpu.ml import dbscan_predict, fast_dbscan, fast_naive_bayes
  rng = np.random.RandomState(0)
  a = rng.randn(40, 2) * 0.1
  b = rng.randn(40, 2) * 0.1 + 5.0
  X = np.concatenate([a, b])
  db = fast_dbscan(X, eps=0.5, min_samples=4)
  lab = dbscan_predict(db)
  assert len(set(lab) - {-1}) == 2
  newx = np.array([[0.0, 0.0], [5.0, 5.0], [100.0, 100.0]])
  pred = dbscan_predict(db, newx)
  assert pred[0] != pred[1] and pred[0] >= 0 and pred[1] >= 0
  assert pred[2] == -1  # far point -> noise

  Xc = rng.randint(0, 2, size=(200, 10))
  y = (Xc[:, 0] | Xc[:, 1]).astype(int)
  nb = fast_naive_bayes(Xc, y, distribution="bernoulli")
  assert (nb.predict(Xc) == y).mean() > 0.9
  with pytest.raises(ValueError):
    fast_naive_bayes(Xc, y, distribution="nope")


def test_stats_kl_and_reports():
  from odin_tpu.stats import (KL_divergence, classification_diagnose,
                              classification_report)
  assert KL_divergence([1, 1, 2], [1, 1, 2]) == pytest.approx(0.0)
  assert KL_divergence({"a": 3, "b": 1}, {"a": 1, "b": 3}) > 0
  y_true = np.array([0, 0, 1, 1, 2, 2])
  y_pred = np.array([0, 1, 1, 1, 2, 0])
  rep = classification_report(y_pred, y_true, labels=["x", "y", "z"])
  assert "Accuracy" in rep and "Confusion" in rep
  X = np.arange(6)
  diag = classification_diagnose(X, y_true, y_pred, num_samples=4)
  assert (0, 1) in diag and (2, 0) in diag
  assert all(y_true[s] != y_pred[s] for pair in diag for s in []) or True
  assert diag[(0, 1)] == [1]


def test_image_affine_ops():
  from odin_tpu.preprocessing.image import (apply_transform, rotate, shear,
                                            shift, zoom)
  img = np.zeros((16, 16, 1), "f")
  img[6:10, 6:10] = 1.0
  ident = apply_transform(img, np.eye(3))
  np.testing.assert_allclose(ident, img)
  for fn, kw in ((rotate, dict(rg=30)), (shift, dict(wrg=0.2, hrg=0.2)),
                 (zoom, dict(zoom_width=0.8, zoom_height=1.2)),
                 (shear, dict(intensity=0.4))):
    out = fn(img, seed=1, **kw)
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, img)  # something moved
    assert out.sum() > 0


def test_audio_augmentor_stage():
  from odin_tpu.preprocessing import AudioAugmentor, make_pipeline
  rng = np.random.RandomState(1)
  y = rng.randn(4096).astype("f")
  pipe = make_pipeline([AudioAugmentor(seed=3)])
  out = pipe({"raw": y, "sr": 8000})
  assert out["raw"].shape == y.shape
  assert not np.array_equal(out["raw"], y)
  out2 = pipe({"raw": y, "sr": 8000})
  np.testing.assert_array_equal(out["raw"], out2["raw"])  # deterministic


def test_simple_rnn_and_new_activations():
  from odin_tpu.networks import SimpleRNN
  from odin_tpu.networks.base import get_activation
  x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3).astype("f"))
  rnn = SimpleRNN(units=4)
  params = rnn.init(jax.random.PRNGKey(0), x)
  y = rnn.apply(params, x)
  assert y.shape == (2, 5, 4)
  y_last = SimpleRNN(units=4, return_sequences=False).apply(params, x)
  assert y_last.shape == (2, 4)
  np.testing.assert_allclose(np.asarray(y[:, -1]), np.asarray(y_last),
                             rtol=1e-5)
  assert float(get_activation("mish")(jnp.asarray(0.0))) == pytest.approx(0.0)
  assert float(get_activation("softplus1")(jnp.asarray(0.0))) == \
      pytest.approx(1.0, rel=1e-5)


def test_tabledict_and_named_loaders(tmp_path):
  from odin_tpu.fuel import SQLiteDict, TableDict
  from odin_tpu.fuel.loaders import IRIS, MUSAN, load_glove
  db = SQLiteDict(str(tmp_path / "x.db"))
  t1 = TableDict(db, "speakers")
  t2 = TableDict(db, "scores")
  t1["a"] = [1, 2, 3]
  t2["a"] = "different table"
  assert t1["a"] == [1, 2, 3] and t2["a"] == "different table"
  assert len(t1) == 1 and list(t1) == ["a"]
  del t1["a"]
  assert "a" not in t1 and t2["a"] == "different table"
  with pytest.raises(KeyError):
    _ = t1["a"]

  x, y = IRIS().load()  # sklearn-backed, works offline
  assert x.shape[1] == 4 and len(x) == len(y)
  assert not MUSAN(path=str(tmp_path / "nope")).is_available
  with pytest.raises(FileNotFoundError):
    MUSAN(path=str(tmp_path / "nope")).load()
  # glove: local-gated, synthesize a tiny file
  g = tmp_path / "glove.6B.3d.txt"
  g.write_text("hello 0.1 0.2 0.3\nworld 1 2 3\n")
  emb = load_glove(3, path=str(g))
  np.testing.assert_allclose(emb["world"], [1, 2, 3])


def test_text_preprocessors_and_filters():
  from odin_tpu.preprocessing.text import (CasePreprocessor, POSfilter,
                                           TransPreprocessor, TYPEfilter,
                                           add_stopword, is_oov, is_stopword)
  cp = CasePreprocessor(lower=True, keep_name=True)
  assert cp.preprocess("Hello NASA world") == ["hello", "NASA", "world"]
  assert CasePreprocessor(lower=True, keep_name=False,
                          split=None).preprocess("ABC") == "abc"
  tp = TransPreprocessor()
  assert tp.preprocess("a,b.c!") == "a b c"
  assert tp.preprocess(["x;y", "z"]) == "x y z"

  tf = TYPEfilter(is_alpha=True)
  assert tf("word") == "word" and tf("w0rd") == ""
  assert TYPEfilter(is_digit=True)("123") == "123"
  pf = POSfilter(pos=("NOUN",))
  assert pf("cat", "NOUN") == "cat" and pf("run", "VERB") == ""
  assert pf("unknown") == "unknown"  # no tags -> pass-through

  assert is_stopword("the") and not is_stopword("spectrogram")
  add_stopword("odin")
  assert is_stopword("ODIN")
  assert is_oov("zzz", {"abc": 1}) and not is_oov("abc", {"abc": 1})


def test_depth_to_space_and_resampling():
  from odin_tpu.networks import DepthToSpace, Resampling2D
  x = jnp.arange(2 * 4 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 4, 8)
  y = DepthToSpace(block_size=2).apply({}, x)
  assert y.shape == (2, 8, 8, 2)
  # energy preserved (pure relayout)
  np.testing.assert_allclose(np.sum(np.asarray(y) ** 2),
                             np.sum(np.asarray(x) ** 2), rtol=1e-6)
  # the r x r sub-block at output (0:2, 0:2) comes from input pixel (0, 0)
  np.testing.assert_allclose(np.asarray(y[0, :2, :2, :]).ravel(),
                             np.asarray(x[0, 0, 0, :]).ravel())
  up = Resampling2D(2.0).apply({}, x)
  assert up.shape == (2, 8, 8, 8)
  np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]),
                             np.full((2, 2), float(x[0, 0, 0, 0])))
  down = Resampling2D(0.5).apply({}, x)
  assert down.shape == (2, 2, 2, 8)


def test_signal_helper_tail():
  from odin_tpu.preprocessing import signal as S
  f = S.mel_frequencies(n_mels=10, fmin=0, fmax=4000)
  assert f.shape == (10,) and f[0] == pytest.approx(0.0) and \
      f[-1] == pytest.approx(4000.0, rel=1e-6)
  assert np.all(np.diff(f) > 0)
  x = np.ones((3, 5))
  p = S.pad_center(x, 9)
  assert p.shape == (3, 9) and p[0, 2] == 1 and p[0, 0] == 0
  with pytest.raises(ValueError):
    S.pad_center(x, 3)
  l = S.loudness2intensity(np.array([[0.5, 9.9], [1.0, 9.9]]))
  np.testing.assert_allclose(l, [30.0, 60.0])
  # vad mode scales the threshold margin
  S.set_vad_mode(1.0)
  assert S._VAD_MODE == 1.0
  S.set_vad_mode(99)
  assert S._VAD_MODE == 2.4
  S.set_vad_mode(2.0)
  with pytest.raises(RuntimeError):
    S.anything2wav("/nonexistent.mp3")  # no sox/ffmpeg bundled


def test_get_divergence_and_polynomial_kernel():
  """Reference ``vi/losses.py:23-33`` (get_divergence dispatcher) and :222
  (polynomial_kernel, upstream NotImplementedError — implemented here)."""
  import jax
  from odin_tpu.bay.distributions.continuous import Normal
  from odin_tpu.bay.vi import losses as L
  assert L.get_divergence("mmd") is L.maximum_mean_discrepancy
  assert L.get_divergence("tc") is L.total_correlation
  assert L.get_divergence("dip") is L.disentangled_inferred_prior_loss
  with pytest.raises(ValueError):
    L.get_divergence("nope")
  x = np.random.RandomState(0).randn(8, 4).astype("f")
  y = np.random.RandomState(1).randn(6, 4).astype("f")
  k = np.asarray(L.polynomial_kernel(jnp.asarray(x), jnp.asarray(y)))
  assert k.shape == (8, 6)
  np.testing.assert_allclose(
      k, (x @ y.T / 4 + 1.0) ** 2, rtol=1e-5)
  # polynomial kernel usable inside MMD: same dist -> near 0, far -> large
  q = Normal(jnp.zeros(4), jnp.ones(4))
  p_far = Normal(jnp.full(4, 5.0), jnp.ones(4))
  key = jax.random.PRNGKey(0)
  near = float(L.maximum_mean_discrepancy(q, q, key, q_sample_shape=64,
                                          p_sample_shape=64,
                                          kernel="polynomial"))
  far = float(L.maximum_mean_discrepancy(q, p_far, key, q_sample_shape=64,
                                         p_sample_shape=64,
                                         kernel="polynomial"))
  assert far > near + 1.0


def test_gym_pooling_helpers_and_latent_stats_plot(tmp_path):
  """Reference gym helpers concat_mean/first_mean (:70,:74) and
  plot_latent_stats (:173)."""
  from odin_tpu.bay.distributions.continuous import Normal
  from odin_tpu.bay.vi import concat_mean, first_mean, plot_latent_stats
  d1 = Normal(jnp.ones((5, 3)), jnp.ones((5, 3)))
  d2 = Normal(jnp.zeros((5, 2)), jnp.ones((5, 2)))
  cm = concat_mean([d1, d2])
  assert cm.shape == (5, 5)
  np.testing.assert_allclose(cm[:, :3], 1.0)
  np.testing.assert_allclose(cm[:, 3:], 0.0)
  fm = first_mean([d1, d2])
  assert fm.shape == (5, 3) and np.all(fm == 1.0)
  fig = plot_latent_stats(mean=np.zeros(6), stddev=np.ones(6),
                          kld=np.arange(6.0), weights=np.ones(6))
  out = tmp_path / "latent_stats.png"
  fig.savefig(out)
  assert out.exists() and out.stat().st_size > 0


def test_backend_alias_parsers():
  """Reference ``odin/backend/alias.py``: every parse_* resolves aliases to
  jax/flax/optax objects; parse_activation supports '+' composition."""
  import optax
  from odin_tpu import backend as K
  act = K.parse_activation("relu+tanh")
  np.testing.assert_allclose(np.asarray(act(jnp.array([-2.0, 0.5]))),
                             np.tanh(np.maximum([-2.0, 0.5], 0)), rtol=1e-6)
  assert K.parse_activation(None)(3.0) == 3.0
  w = K.parse_initializer("glorot_uniform")(
      __import__("jax").random.PRNGKey(0), (4, 4), jnp.float32)
  assert w.shape == (4, 4)
  opt = K.parse_optimizer("adam")(1e-3)
  assert isinstance(opt, optax.GradientTransformation)
  reg = K.parse_regularizer("l2")
  assert float(reg({"w": jnp.ones((2, 2))}, scale=1.0)) == pytest.approx(4.0)
  con = K.parse_constraint("nonneg")
  assert float(con(jnp.array(-1.0))) == 0.0
  red = K.parse_reduction("stat")
  out = red(jnp.ones((8, 3)), axis=0)
  assert out.shape == (6,)
  import flax.linen as nn
  assert K.parse_normalizer("layernorm") is nn.LayerNorm
  from odin_tpu.networks.attention import SelfAttention
  assert K.parse_attention("self") is SelfAttention
  from odin_tpu.networks.base import Dense
  assert K.parse_layer("dense") is Dense
  loss = K.parse_loss("mse")
  assert float(jnp.sum(loss(jnp.zeros(3), jnp.ones(3)))) == pytest.approx(3.0)
  metr = K.parse_metric("accuracy")
  assert metr(np.array([0, 1]), np.eye(2)) == 1.0
  with pytest.raises(ValueError):
    K.parse_loss("nope")
  with pytest.raises(ValueError):
    K.parse_initializer("nope")


def test_async_checkpoint_is_donation_safe(tmp_path):
  """`save_checkpoint(blocking=False)` snapshots the state with an
  on-device copy and writes on a thread — so the training loop may donate
  the live buffers to the next step (`donate_argnums=(0,)`) while the
  write is in flight.  The restored checkpoint must equal the state AT
  SAVE TIME bit-for-bit, not the later state."""
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.networks import get_networks
  from odin_tpu.training.trainer import Trainer

  X = np.random.RandomState(0).rand(128, 2).astype("f")
  vae = BetaVAE(beta=1.0, **get_networks("halfmoons", zdim=2)).build(seed=0)
  fn = vae.make_step_fn(learning_rate=1e-2)  # jitted, donates the state
  state = jax.device_get(vae.state)
  state, _ = fn(state, X[:64])
  expected = jax.device_get(state)
  tr = Trainer(logdir=str(tmp_path))
  path = tr.save_checkpoint(state, blocking=False)
  # donate the saved state's buffers while the writer may still be running
  for i in range(3):
    state, _ = fn(state, X[64:])
  tr.wait_for_checkpoint()
  restored = tr.restore_checkpoint(path)
  assert int(restored.step) == int(expected.step)
  for a, b in zip(jax.tree.leaves(expected.params),
                  jax.tree.leaves(restored.params)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # and the live state moved on
  assert int(jax.device_get(state.step)) == int(expected.step) + 3
  tr.wait_for_checkpoint()  # idempotent no-op


def test_softmin_and_upsample():
  from odin_tpu.backend.maths import softmin, upsample
  x = np.array([[1.0, 2.0, 3.0]], "f")
  sm = np.asarray(softmin(x, axis=-1))
  np.testing.assert_allclose(sm, np.exp(-x) / np.exp(-x).sum(), rtol=1e-6)
  # 'nn' repeats elements; 'repeat' tiles the axis (reference maths.py:617)
  v = np.array([1, 2], "f")
  np.testing.assert_array_equal(np.asarray(upsample(v, 2, 0, "nn")),
                                [1, 1, 2, 2])
  np.testing.assert_array_equal(np.asarray(upsample(v, 2, 0, "repeat")),
                                [1, 2, 1, 2])
  img = np.ones((1, 2, 2), "f")
  up = np.asarray(upsample(img, 2, axes=(1, 2), method="nn"))
  assert up.shape == (1, 4, 4) and up.sum() == 16
  pm = np.asarray(upsample(img, 3, axes=(1,), method="pad_margin"))
  assert pm.shape == (1, 6, 2) and pm.sum() == 4  # content centered
