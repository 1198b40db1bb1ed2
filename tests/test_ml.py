"""Classical ML: GMM EM correctness, i-vector pipeline, PLDA, PCA, scoring."""
import numpy as np
import pytest

from odin_tpu.ml import (
    GMM, Ivector, KMeansJax, PLDA, PPCA, Scorer, Tmatrix, VectorNormalizer,
    fast_kmeans, fast_pca, linear_classifier)

RNG = np.random.RandomState(9)


def gmm_data(n=4000, means=((-4, 0), (4, 0), (0, 5), (0, -5)), std=0.7):
  parts = [RNG.randn(n // len(means), 2) * std + np.asarray(m)
           for m in means]
  return np.concatenate(parts).astype("f")


def test_gmm_recovers_components():
  X = gmm_data()
  gmm = GMM(nmix=4, batch_size=2048).fit(X)
  assert gmm.is_fitted
  # recovered means close to the true ones (match by nearest)
  true = np.array([(-4, 0), (4, 0), (0, 5), (0, -5)], "f")
  d = ((gmm.mu[:, None, :] - true[None]) ** 2).sum(-1)
  assert np.all(d.min(axis=0) < 0.3), gmm.mu
  # weights ~ uniform, variances ~ std^2
  np.testing.assert_allclose(gmm.w, 0.25, atol=0.05)
  np.testing.assert_allclose(gmm.sigma.mean(), 0.49, rtol=0.35)
  # sklearn agreement on mean log-likelihood
  from sklearn.mixture import GaussianMixture
  sk = GaussianMixture(4, covariance_type="diag", random_state=1).fit(X)
  assert abs(gmm.score(X) - sk.score(X)) < 0.05


def test_gmm_vs_sklearn_posteriors():
  X = gmm_data(2000)
  gmm = GMM(nmix=2, batch_size=1024).fit(X)
  Z, F, S, llk = gmm.expectation(X)
  assert Z.sum() == pytest.approx(len(X), rel=1e-6)
  # M-step fixed point: another maximization barely moves the params
  mu_before = gmm.mu.copy()
  gmm.maximization(Z, F, S)
  assert np.abs(gmm.mu - mu_before).max() < 1e-2


def _utterances(n_utt=60, n_frames=120, n_speakers=6, ndim=12, n_phones=4):
  """Speech-like utterances: frames drawn around SHARED 'phoneme' clusters
  (what the UBM models) plus a per-speaker offset (what the i-vector must
  recover).  A single-blob-per-speaker design would degenerate: UBM
  components lock onto speakers and centered stats vanish."""
  phones = RNG.randn(n_phones, ndim).astype("f") * 4.0
  spk_shift = RNG.randn(n_speakers, ndim).astype("f") * 1.0
  utts, labels = [], []
  for i in range(n_utt):
    spk = i % n_speakers
    ph = phones[RNG.randint(0, n_phones, n_frames)]
    utts.append(ph + spk_shift[spk] + RNG.randn(n_frames, ndim).astype("f"))
    labels.append(spk)
  return utts, np.asarray(labels), spk_shift


def test_ivector_pipeline_separates_speakers(tmp_path):
  utts, labels, _ = _utterances()
  ivec = Ivector(path=str(tmp_path / "ivec"), nmix=4, tv_dim=8,
                 niter_tmat=5, batch_size=4096)
  vecs = ivec.fit_transform(utts)
  assert vecs.shape == (60, 8)
  assert np.isfinite(vecs).all()
  # i-vectors must be speaker-discriminative: cosine scoring EER low
  scorer = Scorer(method="cosine", wccn=True)
  scorer.fit(vecs[:36], labels[:36])
  pred = scorer.predict(vecs[36:])
  acc = np.mean(pred == labels[36:])
  assert acc > 0.8, acc
  # caching: second fit reuses artifacts
  ivec2 = Ivector(path=str(tmp_path / "ivec"), nmix=4, tv_dim=8)
  vecs2 = ivec2.fit_transform(utts)
  np.testing.assert_allclose(vecs, vecs2, atol=1e-5)


def test_plda_verification():
  # class-structured vectors (own RNG: module-level state is order-dependent)
  rng = np.random.RandomState(42)
  n_cls, per = 10, 20
  centers = rng.randn(n_cls, 20) * 3
  X = np.concatenate([centers[i] + rng.randn(per, 20) for i in range(n_cls)])
  y = np.repeat(np.arange(n_cls), per)
  plda = PLDA(n_phi=8, n_iter=8).fit(X, y)
  # same-class trials should outscore different-class trials
  Xte = np.concatenate([centers[i] + rng.randn(4, 20) for i in range(n_cls)])
  yte = np.repeat(np.arange(n_cls), 4)
  S = plda.score_matrix(Xte, Xte)
  same = S[yte[:, None] == yte[None, :]]
  diff = S[yte[:, None] != yte[None, :]]
  assert same.mean() > diff.mean() + 1.0
  # the Schur-complement fast path must equal the direct joint-Gaussian llr
  # (score_trials) pairwise — this pins the quadratic-term SIGNS, which the
  # mean-separation check above cannot (the cross term dominates ranking;
  # round-5 caught a sign flip here that cost ~9% absolute EER open-set)
  M = np.array([[plda.score_trials(Xte[i:i + 1], Xte[j:j + 1])[0]
                 for j in range(0, 12, 3)] for i in range(0, 8, 2)])
  np.testing.assert_allclose(S[0:8:2][:, 0:12:3], M, rtol=1e-8, atol=1e-8)
  # closed-set prediction
  acc = np.mean(plda.predict(Xte) == yte)
  assert acc > 0.9
  # EER sanity through the backend metrics
  from odin_tpu.backend import compute_EER, det_curve
  mask = ~np.eye(len(yte), dtype=bool)
  scores = S[mask]
  lab = (yte[:, None] == yte[None, :])[mask]
  Pfa, Pmiss, _ = det_curve(lab.astype(int), scores)
  assert compute_EER(Pfa, Pmiss) < 0.1


def test_ppca_matches_pca_subspace():
  X = (RNG.randn(500, 2) @ np.array([[3, 0], [0, 0.5]]) @
       np.array([[np.cos(0.6), -np.sin(0.6)], [np.sin(0.6), np.cos(0.6)]]))
  X = np.concatenate([X, RNG.randn(500, 3) * 0.1], axis=1).astype("f")
  ppca = PPCA(n_components=2, n_iter=100).fit(X)
  from sklearn.decomposition import PCA
  pca = PCA(n_components=2).fit(X)
  # principal SUBSPACES align (PPCA's W spans the subspace but its columns
  # need not be orthogonal — orthonormalize before comparing)
  Q, _ = np.linalg.qr(ppca.W)
  sv = np.linalg.svd(pca.components_ @ Q, compute_uv=False)
  assert np.all(sv > 0.95), sv
  Z, model = fast_pca(X, n_components=2, return_model=True)
  assert Z.shape == (500, 2)


def test_kmeans_jax():
  X = gmm_data(2000)
  km = KMeansJax(n_clusters=4, random_state=3).fit(X)
  from sklearn.metrics import adjusted_rand_score
  true = np.repeat(np.arange(4), 500)
  assert adjusted_rand_score(true, km.labels_) > 0.95
  assert km.predict(X[:10]).shape == (10,)
  sk = fast_kmeans(X, n_clusters=4, framework="sklearn")
  assert adjusted_rand_score(true, sk.labels_) > 0.95


def test_vector_normalizer_and_classifiers():
  X = RNG.randn(200, 10).astype("f") + 5.0
  y = RNG.randint(0, 3, 200)
  vn = VectorNormalizer(centering=True, wccn=True, unit_length=True)
  Xn = vn.fit_transform(X, y)
  assert abs(np.linalg.norm(Xn, axis=1).mean() - 1.0) < 1e-6
  for algo in ("lda", "logistic", "rf"):
    model = linear_classifier(X, y, algo=algo)
    assert model.predict(X[:5]).shape == (5,)


def test_randomized_pca_matches_exact():
  """RandomizedPCA (randomized SVD, reference decompositions.py:531):
  explained-variance ratios match exact PCA; whiten + inverse round-trip."""
  from sklearn.decomposition import PCA

  from odin_tpu.ml import RandomizedPCA

  rng = np.random.RandomState(0)
  X = rng.randn(300, 40).astype("f")
  X[:, :4] *= 8
  p = RandomizedPCA(n_components=6, random_state=0).fit(X)
  exact = PCA(6).fit(X)
  np.testing.assert_allclose(p.explained_variance_ratio_,
                             exact.explained_variance_ratio_, atol=1e-2)
  Z = p.transform(X)
  assert Z.shape == (300, 6)
  Xr = p.inverse_transform(Z)
  # reconstruction from the top components recovers the dominant block
  assert np.corrcoef(Xr[:, 0], X[:, 0])[0, 1] > 0.95
  Zw = RandomizedPCA(n_components=6, whiten=True,
                     random_state=0).fit_transform(X)
  np.testing.assert_allclose(np.std(Zw, axis=0), 1.0, atol=0.1)


def test_ml_dispatchers_and_evaluate():
  """clustering/dimension_reduce/DimReduce/evaluate/get_topics_string
  (reference ml/__init__.py:101-260, ml/base.py:17)."""
  from odin_tpu.ml import (DimReduce, clustering, dimension_reduce, evaluate,
                           fast_lda_topics, get_topics_string)

  rng = np.random.RandomState(0)
  X = np.concatenate([rng.randn(40, 6) + 4, rng.randn(40, 6) - 4]).astype("f")
  km = clustering(X, "kmeans", n_clusters=2)
  assert len(np.unique(km.predict(X))) == 2
  assert dimension_reduce(X, algo="pca", n_components=3).shape == (80, 3)
  Zs = (DimReduce.PCA | DimReduce.KMEANS)(X, n_components=2)
  assert len(Zs) == 2 and all(z.shape == (80, 2) for z in Zs)
  y = np.array([0] * 40 + [1] * 40)
  proba = np.stack([1 - y * 0.8 - 0.1, y * 0.8 + 0.1], -1)
  rep = evaluate(y, y_pred_proba=proba, print_log=False)
  assert rep["accuracy"] == 1.0 and np.isfinite(rep["EER"])
  lda = fast_lda_topics(rng.poisson(3, (30, 20)), n_topics=3, max_iter=4)
  txt = get_topics_string(lda, {i: f"w{i}" for i in range(20)}, n_topics=2)
  assert len(txt) == 2


def test_stats_utilities():
  from odin_tpu.stats import (is_binary, is_discrete, logVMR, prior2weights,
                              sparsity_percentage)
  assert is_discrete([1, 2, 3]) and not is_discrete([1.5])
  assert is_binary([0, 1, 1]) and not is_binary([0, 2])
  x = np.zeros((10, 4)); x[0, 0] = 1.0
  assert abs(sparsity_percentage(x) - 39 / 40) < 1e-9
  assert logVMR(np.ones(100)) < 1e-6  # constant -> VMR 0
  w = prior2weights([0.7, 0.2, 0.1, 0.0], min_value=0.1, max_value=1.0)
  assert w[0] < w[1] < w[2] and w[3] == 0.0


def test_gmm_transform_batch_matches_per_utterance():
  """Padded mask-aware batched (Z, F) stats must match the per-utterance
  path exactly (padding frames contribute nothing)."""
  from odin_tpu.ml import GMM

  rng = np.random.RandomState(0)
  utts = [rng.randn(n, 5).astype("f") for n in (33, 64, 17, 120, 64)]
  gmm = GMM(nmix=4, niter=1)
  gmm.initialize(np.concatenate(utts))
  gmm.fit(np.concatenate(utts))
  Zb, Fb = gmm.transform_batch(utts)
  for i, u in enumerate(utts):
    z, f = gmm.transform(u)
    np.testing.assert_allclose(Zb[i], z, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(Fb[i], f, rtol=1e-3, atol=1e-3)


def test_evaluable_report(tmp_path, capsys):
  """Reference ``ml/base.py``: evaluate() scores + PDF report; Evaluable
  mixin wires predict_proba through it (GMMclassifier here)."""
  from odin_tpu.ml import GMMclassifier, evaluate
  rng = np.random.RandomState(0)
  X = np.concatenate([rng.randn(60, 3) + c * 3 for c in range(3)])
  y = np.repeat(np.arange(3), 60)
  clf = GMMclassifier(n_components=1).fit(X, y)
  pdf = tmp_path / "report.pdf"
  clf.evaluate(X, y, title="gmm", path=str(pdf))
  out = capsys.readouterr().out
  assert "Accuracy" in out and "EER" in out
  assert pdf.exists() and pdf.stat().st_size > 0
  # module-level evaluate returns the score dict (above-parity: reference
  # only printed)
  scores = evaluate(y, y_pred_proba=clf.predict_proba(X), print_log=False)
  assert scores["accuracy"] > 0.95
  assert scores["EER"] < 0.2
  assert scores["confusion_matrix"].shape == (3, 3)
  with pytest.raises(ValueError):
    evaluate(y)


def test_gmm_embedding_diagnostics(tmp_path):
  """ProbabilisticEmbedding diagnostic plots (reference
  ``odin/ml/gmm_embedding.py:284-430``): diagnosis/distribution/boxplot
  figures render and save."""
  import matplotlib
  matplotlib.use("Agg")
  from odin_tpu.ml import ProbabilisticEmbedding

  rng = np.random.RandomState(0)
  # two clear modes per dimension
  X = np.concatenate([rng.randn(100, 3) * 0.3,
                      rng.randn(100, 3) * 0.3 + 3.0])
  pe = ProbabilisticEmbedding(n_components_per_class=2).fit(X)
  pe.plot_diagnosis(X, labels=["a", "b", "c"])
  pe.plot_distribution(X)
  pe.boxplot(X)
  assert set(pe._figures) == {"diagnosis", "distribution", "boxplot"}
  out = tmp_path / "diag.pdf"
  pe.save_figures(str(out))
  assert out.exists() and out.stat().st_size > 0
  assert pe._figures == {}
  # input validation: wrong width raises
  import pytest as _pytest
  with _pytest.raises(AssertionError):
    pe.plot_distribution(X[:, :2])
