"""DisentanglementGym — one-stop evaluation of latent representations.

Reference: ``odin/bay/vi/disentanglement_gym.py`` — `GroundTruth`
(:355-558: factor matrix, discretization, stratified factor sampling),
`DisentanglementGym` (:560-1803): `run_model` collecting x/y/qz/px over the
test set (:822-905), metric methods mig/sap/dci/betavae/factorvae/clustering/
relative strength/TC/elbo/llk/kl/accuracy/active units/FID (:1510-1769),
`write_report` (:1769), and the plotting suite (:906-1509).
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from odin_tpu.bay.distributions import Batchwise
from odin_tpu.bay.helpers import concat_distributions
from odin_tpu.bay.vi import metrics as _metrics
from odin_tpu.bay.vi import downstream_metrics as _dm
from odin_tpu.bay.vi.losses import total_correlation as _tc
from odin_tpu.bay.vi.utils import discretizing

__all__ = ["GroundTruth", "DisentanglementGym", "concat_mean", "first_mean",
           "plot_latent_stats"]


def _reshape2D(x) -> np.ndarray:
  x = np.asarray(x)
  return x.reshape(x.shape[0], -1)


def concat_mean(dists: Sequence[Any]) -> np.ndarray:
  """Concatenate the 2-D means of several distributions along features
  (reference ``disentanglement_gym.py:70``)."""
  return np.concatenate([_reshape2D(d.mean()) for d in dists], -1)


def first_mean(dists: Sequence[Any]) -> np.ndarray:
  """2-D mean of the first distribution (reference :74)."""
  return _reshape2D(dists[0].mean())


def plot_latent_stats(mean, stddev, kld=None, weights=None, ax=None,
                      name: str = "q(z|x)"):
  """Per-dimension latent statistics line plot: mean + stddev on the left
  axis, KL(q|p) and decoder weight norms on a twin axis
  (reference ``disentanglement_gym.py:173-230``)."""
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  if ax is None:
    _, ax = plt.subplots(figsize=(8, 3))
  l1 = ax.plot(np.asarray(mean), label="mean", linewidth=0.5, marker="o",
               markersize=3, color="r", alpha=0.5)
  l2 = ax.plot(np.asarray(stddev), label="stddev", linewidth=0.5,
               marker="^", markersize=3, color="g", alpha=0.5)
  ax.tick_params(axis="y", colors="r")
  ax.set_ylabel(f"{name} Mean", color="r")
  ax.grid(True)
  lines = l1 + l2
  if kld is not None or weights is not None:
    ax2 = ax.twinx()
    if kld is not None:
      lines += ax2.plot(np.asarray(kld), label="KL(q|p)", linestyle="--",
                        color="y", marker="s", markersize=2.5,
                        linewidth=1.0, alpha=0.5)
    if weights is not None:
      lines += ax2.plot(np.asarray(weights), label="weights",
                        linestyle="--", color="b", marker="s",
                        markersize=2.5, linewidth=1.0, alpha=0.5)
    ax2.grid(False)
  ax.legend(lines, [ln.get_label() for ln in lines], fontsize=7)
  return ax.figure


class GroundTruth:
  """Ground-truth factor matrix + sampling utilities
  (reference :355-558)."""

  def __init__(self, factors: np.ndarray,
               factor_names: Optional[Sequence[str]] = None,
               categorical: Union[bool, Sequence[bool]] = False,
               n_bins: int = 8,
               strategy: str = "uniform"):
    factors = np.asarray(factors)
    if factors.ndim == 1:
      factors = factors[:, None]
    self.factors_original = factors
    self.factor_names = list(factor_names) if factor_names is not None else \
        [f"factor{i}" for i in range(factors.shape[1])]
    # discretize continuous columns
    is_discrete = np.array([
        np.allclose(factors[:, i], np.round(factors[:, i])) and
        len(np.unique(factors[:, i])) <= 64
        for i in range(factors.shape[1])])
    if np.all(is_discrete):
      self.factors = factors.astype(np.int64)
    else:
      cols = []
      for i in range(factors.shape[1]):
        if is_discrete[i]:
          cols.append(factors[:, i].astype(np.int64))
        else:
          cols.append(discretizing(factors[:, i:i + 1], n_bins=n_bins,
                                   strategy=strategy).ravel())
      self.factors = np.stack(cols, -1)

  @property
  def n_factors(self) -> int:
    return self.factors.shape[1]

  @property
  def shape(self):
    return self.factors.shape

  def sample_factors(self, n: int = 16, seed: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(self.factors), size=n, replace=False)
    return self.factors[idx], idx

  def sample_indices_from_factors(self, factors: np.ndarray,
                                  seed: int = 1) -> np.ndarray:
    """Indices of dataset rows matching each requested factor combination
    (nearest match)."""
    rng = np.random.RandomState(seed)
    factors = np.atleast_2d(factors)
    out = []
    for f in factors:
      d = np.sum(np.abs(self.factors - f), axis=1)
      cands = np.where(d == d.min())[0]
      out.append(rng.choice(cands))
    return np.asarray(out)


class DisentanglementGym:
  """Evaluate a VAE's latent space against ground-truth factors.

  Usage::

    gym = DisentanglementGym(dataset=dSpritesSmall(), model=vae)
    gym.run_model(n_samples=1000, partition='test')
    scores = gym.write_report('report.txt')
  """

  def __init__(self,
               dataset=None,
               model=None,
               x: Optional[np.ndarray] = None,
               y: Optional[np.ndarray] = None,
               batch_size: int = 64,
               seed: int = 1):
    self.model = model
    self.dataset = dataset
    self.batch_size = int(batch_size)
    self.seed = int(seed)
    self._x, self._y = x, y
    # run_model outputs
    self.x_true: Optional[np.ndarray] = None
    self.factors: Optional[np.ndarray] = None
    self.qz = None
    self.px = None
    self.groundtruth: Optional[GroundTruth] = None
    self._z_mean = None
    self._z_discrete = None
    self._llk_total = None
    self._kl_total = None

  # -- data collection --------------------------------------------------------
  def run_model(self, n_samples: int = 1000, partition: str = "test",
                n_bins: int = 8, verbose: bool = False):
    """Collect x, factors, q(z|x), p(x|z) over the evaluation set
    (reference :822-905)."""
    if self._x is not None:
      x, y = self._x, self._y
    else:
      x, y = self.dataset.numpy(partition)
      x = self.dataset.normalize255(x) if hasattr(self.dataset, "normalize255") else x
    if n_samples > 0:
      x, y = x[:n_samples], (y[:n_samples] if y is not None else None)
    self.x_true = np.asarray(x)
    self.factors = np.asarray(y) if y is not None else None
    # Batched, jitted posterior-path inference: `reconstruct` compiles once
    # for the fixed batch size (the tail is padded then trimmed), replacing
    # the round-1 op-by-op host loop — and for hierarchical models it keeps
    # the ladder posteriors (decode-with-hiddens), so gym elbo/llk match the
    # training objective.
    n, bs = len(x), self.batch_size
    n_pad = (-n) % bs
    xp = np.concatenate([x, x[:n_pad]]) if n_pad else x
    import jax as _jax
    import jax.numpy as _jnp
    # Per-sample llk/kl totals straight from `elbo_components` — the SAME
    # objective the model trains on, so gym elbo/llk/kl include every KL
    # term (ladder rungs, VQ commitment, ...), not just the top latents.
    # Round-1 bug class: the z-mean MC estimate below silently dropped
    # hierarchical rung KLs (ladder gym kl 6.2 vs training kl ~70).
    state = self.model.state

    def _elbo_parts(batch):
      llk, kl, _ = self.model.elbo_components(
          state.params, batch, _jax.random.PRNGKey(self.seed), state.step,
          False, state.mutables)

      def tot(d):
        out = _jnp.zeros((bs,), _jnp.float32)
        for v in d.values():
          v = _jnp.asarray(v, _jnp.float32)
          if v.ndim > 1:  # average sample dims, keep the trailing batch axis
            v = v.mean(axis=tuple(range(v.ndim - 1)))
          out = out + v
        return out

      return tot(llk), tot(kl)

    elbo_fn = _jax.jit(_elbo_parts)
    qzs, pxs, llks, kls = [], [], [], []
    for i in range(0, len(xp), bs):
      batch = xp[i:i + bs]
      qz, px = self.model.reconstruct(batch, seed=self.seed)
      qzs.append(qz)
      pxs.append(px)
      if elbo_fn is not None:
        try:
          llk_b, kl_b = elbo_fn(batch)
          llks.append(np.asarray(llk_b))
          kls.append(np.asarray(kl_b))
        except Exception:  # e.g. semi-supervised objective needing labels
          elbo_fn = None
    trim = (lambda d: _jax.tree_util.tree_map(lambda a: a[:n], d)) \
        if n_pad else (lambda d: d)
    self._llk_total = np.concatenate(llks)[:n] if elbo_fn is not None \
        and llks else None
    self._kl_total = np.concatenate(kls)[:n] if elbo_fn is not None \
        and kls else None
    # pull to host: metric kernels are NumPy/sklearn, and leaving 10k-sample
    # distribution pytrees (hierarchical rungs!) device-resident exhausts
    # HBM before the plotting passes run their own jitted programs
    self.qz = _jax.device_get(trim(concat_distributions(qzs, axis=0)))
    self.px = _jax.device_get(trim(concat_distributions(pxs, axis=0)))
    self._z_mean = np.asarray(self.qz.mean())
    self._z_discrete = discretizing(self._z_mean, n_bins=n_bins,
                                    strategy="uniform")
    if self.factors is not None:
      self.groundtruth = GroundTruth(self.factors,
                                     getattr(self.dataset, "labels", None))
    return self

  def _require_run(self):
    assert self._z_mean is not None, "call run_model() first"

  @property
  def z_mean(self) -> np.ndarray:
    self._require_run()
    return self._z_mean

  # -- scores -------------------------------------------------------------------
  def mig_score(self, protocol: str = "reference") -> float:
    """Mutual information gap (reference :1510).

    protocol="reference" keeps the reference's discretization (the
    `run_model(n_bins=8)` uniform bins); protocol="dlib" re-discretizes the
    posterior means into the 20 equal-width bins disentanglement_lib's
    published numbers use (``_histogram_discretize`` there)."""
    self._require_run()
    if protocol == "dlib":
      z20 = discretizing(self._z_mean, n_bins=20, strategy="uniform")
      return _metrics.mutual_info_gap(z20, self.groundtruth.factors)
    return _metrics.mutual_info_gap(self._z_discrete, self.groundtruth.factors)

  def sap_score(self) -> float:
    """Separated attribute predictability (reference :1535)."""
    self._require_run()
    return _dm.separated_attr_predictability(self._z_mean,
                                             self.groundtruth.factors,
                                             seed=self.seed)

  def dci_score(self) -> Tuple[float, float, float]:
    """(disentanglement, completeness, informativeness) (reference :1542)."""
    self._require_run()
    return _dm.dci_scores(self._z_mean, self.groundtruth.factors,
                          seed=self.seed)

  def betavae_score(self, n_samples: Optional[int] = None,
                    protocol: str = "reference") -> float:
    """Higgins' beta-VAE metric.

    protocol="reference" follows the reference's own evaluation
    (``downstream_metrics.py:399``): 10 MCMC samples of z, pair batches of
    10, `n_samples` votes (default 2,000).  protocol="dlib" follows
    disentanglement_lib's ``beta_vae_sklearn`` — the protocol behind every
    published number: posterior MEAN representation, pair batches of 64,
    `n_samples` train votes (default 10,000) scored on 5,000 held-out eval
    votes.  The two differ materially on the same model (the MCMC-sample
    noise and the 6x smaller averaging batch depress the
    reference-protocol score); results/fullgrid reports both."""
    self._require_run()
    if protocol == "dlib":
      return _dm.beta_vae_score(self.qz, self.groundtruth.factors, n_mcmc=0,
                                batch_size=64,
                                n_samples=n_samples or 10_000,
                                n_eval_samples=5_000, seed=self.seed)
    return _dm.beta_vae_score(self.qz, self.groundtruth.factors,
                              n_samples=n_samples or 2_000, seed=self.seed)

  def factorvae_score(self, n_samples: Optional[int] = None,
                      protocol: str = "reference") -> float:
    """Kim & Mnih's FactorVAE metric.

    protocol="reference": 10 MCMC samples of z, batches of 256, `n_samples`
    votes (default 2,000; the reference's ``downstream_metrics.py:431``).
    protocol="dlib": disentanglement_lib's published protocol — posterior
    MEAN, batches of 64, `n_samples` train votes (default 10,000) with
    5,000 held-out eval votes, dims pruned at std < 0.05."""
    self._require_run()
    if protocol == "dlib":
      return _dm.factor_vae_score(self.qz, self.groundtruth.factors,
                                  n_mcmc=0, batch_size=64,
                                  n_samples=n_samples or 10_000,
                                  n_eval_samples=5_000,
                                  prune_threshold=0.05, prune_scale="std",
                                  seed=self.seed)
    return _dm.factor_vae_score(self.qz, self.groundtruth.factors,
                                n_samples=n_samples or 2_000, seed=self.seed)

  def clustering_score(self, factor_index: int = 0) -> Dict[str, float]:
    """ARI/AMI/NMI/ASW (reference :1571)."""
    self._require_run()
    return _metrics.unsupervised_clustering_scores(
        self.groundtruth.factors[:, factor_index], self._z_mean,
        random_state=self.seed)

  def relative_disentanglement_strength(self, method: str = "spearman") -> float:
    """Reference :1592."""
    self._require_run()
    mat = _metrics.correlation_matrix(self._z_mean,
                                      self.groundtruth.factors_original,
                                      method=method, seed=self.seed)
    return _metrics.relative_strength(mat)

  def correlation_matrix(self, method: str = "spearman") -> np.ndarray:
    self._require_run()
    return _metrics.correlation_matrix(self._z_mean,
                                       self.groundtruth.factors_original,
                                       method=method, seed=self.seed)

  def total_correlation(self) -> float:
    """Gaussian minibatch-TC of the aggregate posterior (reference :1607)."""
    self._require_run()
    import jax.numpy as jnp
    z = jnp.asarray(self._z_mean)
    return float(_tc(z, self.qz))

  def elbo(self) -> float:
    """Reference :1619."""
    return float(np.mean(self.log_likelihood_values() -
                         self.kl_divergence_values()))

  def log_likelihood_values(self) -> np.ndarray:
    self._require_run()
    if getattr(self, "_llk_total", None) is not None:
      return self._llk_total
    return np.asarray(self.px.log_prob(self.x_true))

  def log_likelihood(self) -> float:
    return float(np.mean(self.log_likelihood_values()))

  def kl_divergence_values(self) -> np.ndarray:
    """Per-sample total KL.  Primary source: the model's own
    `elbo_components` sums collected in `run_model` (includes ladder-rung /
    auxiliary terms).  Fallback (objective needs labels): single-point MC
    estimate log q(z̄) − log p(z̄) on the top latents."""
    self._require_run()
    if getattr(self, "_kl_total", None) is not None:
      return self._kl_total
    prior = self.model.latents_prior
    if prior is None:
      return np.zeros(len(self._z_mean))
    import jax.numpy as jnp
    z = jnp.asarray(self._z_mean)
    return np.asarray(self.qz.log_prob(z) - prior.log_prob(z))

  def kl_divergence(self) -> float:
    return float(np.mean(self.kl_divergence_values()))

  def kl_unweighted_values(self) -> np.ndarray:
    """Per-sample UNWEIGHTED analytic KL(q(z|x) || p(z)) of the top-level
    latents — the information-theoretic rate that published ELBO/KL tables
    report.  `kl_divergence()` is the OBJECTIVE's KL-side term instead: it
    sums the model's `elbo_components` kl dict, which for the BetaVAE
    family is beta-SCALED (4x the rate at beta=4) and for FactorVAE
    includes the `tc_coef * TC` penalty.  Round-4 finding: conflating the
    two made full-budget runs look like optimization failures (reported
    "KL 69.6" at beta=4 = true rate 17.4).  Ladder-rung KLs are not
    included here (top-level posterior only)."""
    self._require_run()
    prior = self.model.latents_prior
    if prior is None:
      return np.zeros(len(self._z_mean))
    import jax
    from odin_tpu.bay.distributions.base import kl_registry_lookup
    from odin_tpu.bay.helpers import kl_divergence as _kl
    # explicit registry probe instead of a bare try/except (ADVICE r4): a
    # registry regression must not silently inject MC noise into published
    # rate numbers.  `kl_unweighted_estimator` records which path produced
    # the values.
    if kl_registry_lookup(type(self.qz), type(prior)) is not None:
      v = _kl(self.qz, prior, analytic=True)
      self.kl_unweighted_estimator = "analytic"
    else:
      warnings.warn(
          f"no analytic KL registered for ({type(self.qz).__name__}, "
          f"{type(prior).__name__}); kl_unweighted falls back to a "
          f"10-sample MC estimate", stacklevel=2)
      v = _kl(self.qz, prior, q_sample=10,
              seed=jax.random.PRNGKey(self.seed))
      self.kl_unweighted_estimator = "mc10"
    return np.asarray(v)

  def kl_unweighted(self) -> float:
    return float(np.mean(self.kl_unweighted_values()))

  def elbo_unweighted(self) -> float:
    """llk - unweighted top-level KL: the STANDARD (beta=1) ELBO literature
    reports; `elbo()` is the model's own training objective instead."""
    return float(np.mean(self.log_likelihood_values()) -
                 np.mean(self.kl_unweighted_values()))

  def accuracy_score(self) -> float:
    """Linear probe accuracy on the first factor (reference :1680)."""
    self._require_run()
    from sklearn.linear_model import LogisticRegression
    from sklearn.model_selection import train_test_split
    y = self.groundtruth.factors[:, 0]
    xtr, xte, ytr, yte = train_test_split(self._z_mean, y, test_size=0.2,
                                          random_state=self.seed)
    model = LogisticRegression(max_iter=2000).fit(xtr, ytr)
    return float(model.score(xte, yte))

  def active_units(self, threshold: float = 1e-2) -> np.ndarray:
    """Indices of latents with Var[E[z|x]] above threshold
    (Burda et al.; reference :1695)."""
    self._require_run()
    var = np.var(self._z_mean, axis=0)
    return np.where(var > threshold)[0]

  def frechet_inception_distance(self, features_fn=None) -> float:
    """FID between reconstructions and data (reference :1702).  With no
    inception weights offline, `features_fn` defaults to the model's encoder
    mean-latents as the feature space."""
    self._require_run()
    recon = np.asarray(self.px.mean())
    if features_fn is None:
      f_real = self._z_mean
      f_fake = np.asarray(self.model.encode(recon, seed=self.seed).mean())
    else:
      f_real = features_fn(self.x_true)
      f_fake = features_fn(recon)
    from odin_tpu.backend.metrics import frechet_inception_distance as fid
    return fid(f_real, f_fake)

  # -- plots ---------------------------------------------------------------------
  def plot_reconstruction(self, n: int = 16, path: Optional[str] = None):
    """Reference :906."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    recon = np.asarray(self.px.mean())[:n]
    orig = self.x_true[:n]
    cols = int(np.ceil(np.sqrt(n)))
    fig, axes = plt.subplots(2 * int(np.ceil(n / cols)), cols,
                             figsize=(cols * 1.4, 2.8 * np.ceil(n / cols)))
    axes = np.atleast_2d(axes)
    for i in range(n):
      r, c = divmod(i, cols)
      for k, img in ((2 * r, orig[i]), (2 * r + 1, recon[i])):
        ax = axes[k][c]
        ax.imshow(img.squeeze(), cmap="gray" if img.shape[-1] == 1 else None)
        ax.axis("off")
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_latents_traverse(self, n_points: int = 11, n_latents: int = None,
                            path: Optional[str] = None, seed: int = 1):
    """Latent traversal grid (reference :1040)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n_latents = n_latents or min(self._z_mean.shape[1], 10)
    px = self.model.sample_traverse(self.x_true[:1],
                                    feature_indices=list(range(n_latents)),
                                    n_traverse_points=n_points, seed=seed)
    imgs = np.asarray(px.mean()).reshape(n_latents, n_points,
                                         *self.x_true.shape[1:])
    fig, axes = plt.subplots(n_latents, n_points,
                             figsize=(n_points * 1.1, n_latents * 1.1))
    axes = np.atleast_2d(axes)
    for i in range(n_latents):
      for j in range(n_points):
        axes[i][j].imshow(imgs[i, j].squeeze(), cmap="gray")
        axes[i][j].axis("off")
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_latents_tsne(self, factor_index: int = 0,
                        path: Optional[str] = None):
    """2-D t-SNE of latents colored by a factor (reference :1250)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE
    z2 = TSNE(n_components=2, random_state=self.seed,
              perplexity=min(30, len(self._z_mean) - 1)).fit_transform(
        self._z_mean)
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(z2[:, 0], z2[:, 1], s=4,
                    c=self.groundtruth.factors[:, factor_index],
                    cmap="tab10")
    fig.colorbar(sc)
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_correlation(self, method: str = "spearman",
                       path: Optional[str] = None):
    """Factor-latent correlation heatmap, diagonal-aligned
    (reference :1350; alignment via ``odin_tpu.search``)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from odin_tpu.search import diagonal_linear_assignment
    mat = self.correlation_matrix(method=method)
    ids = diagonal_linear_assignment(np.abs(mat))
    mat = mat[ids]
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(mat, cmap="RdBu_r", vmin=-1, vmax=1, aspect="auto")
    ax.set_xticks(range(len(self.groundtruth.factor_names)))
    ax.set_xticklabels(self.groundtruth.factor_names, rotation=45)
    ax.set_ylabel("latents (aligned)")
    fig.colorbar(im)
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_histogram(self, n_bins: int = 40, path: Optional[str] = None):
    """Marginal histogram of every latent dimension with a standard-normal
    overlay (reference `plot_histogram`, :906-1509)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    z = self._z_mean
    D = z.shape[1]
    cols = int(np.ceil(np.sqrt(D)))
    rows = int(np.ceil(D / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 2.2, rows * 1.8))
    axes = np.atleast_1d(axes).ravel()
    grid = np.linspace(-3.5, 3.5, 200)
    normal = np.exp(-0.5 * grid ** 2) / np.sqrt(2 * np.pi)
    for i in range(D):
      ax = axes[i]
      ax.hist(z[:, i], bins=n_bins, density=True, alpha=0.7)
      ax.plot(grid, normal, lw=1.0, color="crimson")
      ax.set_title(f"z{i}", fontsize=8)
      ax.tick_params(labelsize=6)
    for ax in axes[D:]:
      ax.axis("off")
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_distortion(self, path: Optional[str] = None, title: str = ""):
    """Per-pixel mean/std heatmaps of the negative reconstruction
    log-likelihood -log p(x|z) — shows WHERE the decoder spends its
    distortion budget (reference `plot_distortion`, :925-990)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    px = self.px
    base = getattr(px, "distribution", px)  # Independent -> elementwise base
    nll = -np.asarray(base.log_prob(self.x_true))
    if nll.ndim < 3:  # vector data: nothing spatial to draw
      nll = nll.reshape(nll.shape[0], -1, 1, 1)
    if nll.ndim == 3:
      nll = nll[..., None]
    mean, std = np.mean(nll, 0), np.std(nll, 0)
    C = mean.shape[-1]
    fig, axes = plt.subplots(C, 2, figsize=(5, 2.2 * C), squeeze=False)
    for c in range(C):
      for j, (img, lab) in enumerate(((mean, "mean -log p(x|z)"),
                                      (std, "std"))):
        ax = axes[c][j]
        im = ax.pcolormesh(img[..., c], cmap="Spectral", rasterized=True)
        ax.invert_yaxis()
        ax.axis("off")
        ax.set_title(f"{lab} ch{c}", fontsize=7)
        fig.colorbar(im, ax=ax, fraction=0.04, pad=0.02)
    if title:
      fig.suptitle(title, fontsize=9)
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_latents_stats(self, path: Optional[str] = None,
                         title: str = ""):
    """Per-dimension posterior statistics sorted by stddev, with the
    per-dimension KL to the factorized standard-normal prior
    (reference `plot_latents_stats`, :991-1040)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    mean = np.mean(_reshape2D(self.qz.mean()), 0)
    stddev = np.mean(_reshape2D(self.qz.stddev()), 0)
    mu = _reshape2D(self.qz.mean())
    sd = _reshape2D(self.qz.stddev())
    # analytic per-dim KL(N(mu, sd) || N(0, 1)), averaged over samples
    kld = np.mean(0.5 * (mu ** 2 + sd ** 2 - 1.0 - 2.0 * np.log(sd)), 0)
    ids = np.argsort(stddev)
    fig = plot_latent_stats(mean[ids], stddev[ids], kld=kld[ids])
    if title:
      fig.axes[0].set_title(title, fontsize=9)
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_interpolation(self, i: int = 0, j: int = 1, n_points: int = 10,
                         path: Optional[str] = None):
    """Decode the latent line segment between two test inputs
    (reference `plot_interpolation`)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    za, zb = self._z_mean[i], self._z_mean[j]
    ts = np.linspace(0.0, 1.0, n_points)[:, None]
    zs = (1 - ts) * za[None] + ts * zb[None]
    px = self.model.decode(zs.astype("f"), seed=self.seed)
    imgs = np.asarray(px.mean())
    fig, axes = plt.subplots(1, n_points, figsize=(n_points * 1.3, 1.6))
    for k in range(n_points):
      axes[k].imshow(imgs[k].squeeze(), cmap="gray")
      axes[k].axis("off")
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_prior_sampling(self, n: int = 16, path: Optional[str] = None):
    """Decode prior samples z ~ p(z) (reference `plot_prior_sampling`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    px = self.model.sample_observation(n=n, seed=self.seed)
    imgs = np.asarray(px.mean())
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.4, rows * 1.4))
    axes = np.atleast_1d(axes).ravel()
    for k in range(n):
      axes[k].imshow(imgs[k].squeeze(), cmap="gray")
      axes[k].axis("off")
    for ax in axes[n:]:
      ax.axis("off")
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  def plot_pairwise_scatter(self, factor_index: int = 0,
                            max_latents: int = 6,
                            path: Optional[str] = None):
    """Pairwise scatter matrix of the first latents, colored by a factor
    (reference `plot_disentanglement` scatter panels)."""
    self._require_run()
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    z = self._z_mean[:, :max_latents]
    D = z.shape[1]
    c = self.groundtruth.factors[:, factor_index] if self.groundtruth \
        else None
    fig, axes = plt.subplots(D, D, figsize=(D * 1.6, D * 1.6))
    axes = np.atleast_2d(axes)
    for a in range(D):
      for b in range(D):
        ax = axes[a][b]
        if a == b:
          ax.hist(z[:, a], bins=30, alpha=0.7)
        else:
          ax.scatter(z[:, b], z[:, a], s=2, c=c, cmap="tab10", alpha=0.6)
        ax.tick_params(labelsize=5)
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
      return path
    return fig

  # -- report ---------------------------------------------------------------------
  def write_report(self, path: Optional[str] = None,
                   scores: Sequence[str] = ("elbo", "llk", "kl", "mig",
                                            "sap", "dci", "betavae",
                                            "factorvae", "tc",
                                            "active_units"),
                   verbose: bool = False) -> Dict[str, float]:
    """Compute a score suite and optionally dump to a text file
    (reference :1769)."""
    self._require_run()
    out: Dict[str, Any] = {}
    for s in scores:
      try:
        if s == "elbo":
          out["elbo"] = self.elbo()
        elif s == "llk":
          out["log_likelihood"] = self.log_likelihood()
        elif s == "kl":
          out["kl_divergence"] = self.kl_divergence()
          out["kl_unweighted"] = self.kl_unweighted()
          out["elbo_unweighted"] = self.elbo_unweighted()
        elif s == "mig":
          out["mig"] = self.mig_score()
        elif s == "sap":
          out["sap"] = self.sap_score()
        elif s == "dci":
          d, c, i = self.dci_score()
          out.update(dci_disentanglement=d, dci_completeness=c,
                     dci_informativeness=i)
        elif s == "betavae":
          out["betavae_score"] = self.betavae_score()
        elif s == "factorvae":
          out["factorvae_score"] = self.factorvae_score()
        elif s == "tc":
          out["total_correlation"] = self.total_correlation()
        elif s == "active_units":
          out["n_active_units"] = int(len(self.active_units()))
        elif s == "fid":
          out["fid"] = self.frechet_inception_distance()
        elif s == "clustering":
          out.update({f"clustering_{k}": v
                      for k, v in self.clustering_score().items()})
      except Exception as e:
        out[f"{s}_error"] = str(e)
        if verbose:
          raise
    if path is not None:
      with open(path, "w") as f:
        for k, v in out.items():
          f.write(f"{k}: {v}\n")
    return out
