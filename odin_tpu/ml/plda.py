"""PLDA — probabilistic linear discriminant analysis (two-covariance).

Reference: ``odin/ml/plda.py:26-423`` — EM (`expectation_plda`/
`maximization_plda` :303,350), preprocessing chain centering + WCCN +
length-norm via `VectorNormalizer`, `fit_maximum_likelihood` PCA init
(:213), scoring `predict_log_proba` (:384).

Simplified-PLDA model: x = m + V y + eps, y ~ N(0, I_rank),
eps ~ N(0, Sigma); trained by EM over class-grouped i-vectors.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from odin_tpu.ml.scoring import VectorNormalizer

__all__ = ["PLDA"]


class PLDA:

  def __init__(self,
               n_phi: int = 100,
               centering: bool = True,
               wccn: bool = True,
               unit_length: bool = True,
               n_iter: int = 12,
               random_state: int = 1):
    self.n_phi = int(n_phi)
    self.n_iter = int(n_iter)
    self.random_state = int(random_state)
    self.normalizer = VectorNormalizer(centering=centering, wccn=wccn,
                                       unit_length=unit_length)
    self.mean: Optional[np.ndarray] = None
    self.Phi: Optional[np.ndarray] = None     # (D, n_phi)
    self.Sigma: Optional[np.ndarray] = None   # (D, D)
    self._trained_classes: Optional[np.ndarray] = None

  def fit_maximum_likelihood(self, X, y):
    """PCA-flavoured init (reference :213)."""
    from sklearn.decomposition import PCA
    pca = PCA(n_components=self.n_phi, random_state=self.random_state)
    pca.fit(X)
    self.Phi = (pca.components_ *
                np.sqrt(pca.explained_variance_)[:, None]).T
    self.Sigma = np.eye(X.shape[1]) * float(np.var(X - pca.inverse_transform(
        pca.transform(X))).mean() + 1e-3)
    self.mean = X.mean(0)

  def fit(self, X: np.ndarray, y: np.ndarray) -> "PLDA":
    X = np.asarray(X, np.float64)
    y = np.asarray(y).ravel()
    X = self.normalizer.fit(X, y).transform(X)
    self.mean = X.mean(0)
    Xc = X - self.mean
    D = X.shape[1]
    classes, y_idx = np.unique(y, return_inverse=True)
    K = len(classes)
    counts = np.bincount(y_idx).astype(np.float64)  # (K,)
    class_sums = np.zeros((K, D))
    np.add.at(class_sums, y_idx, Xc)
    rng = np.random.RandomState(self.random_state)
    Phi = rng.randn(D, self.n_phi) * 0.1
    Sigma = np.cov(Xc.T) + 1e-6 * np.eye(D)
    I_r = np.eye(self.n_phi)
    for _ in range(self.n_iter):
      # E-step: posterior of y_k per class; classes with equal counts share
      # the same posterior precision L = I + n Phi' Sigma^-1 Phi
      Si = np.linalg.inv(Sigma)
      PtSi = Phi.T @ Si                     # (r, D)
      Ey = np.zeros((K, self.n_phi))
      sum_Eyy = np.zeros((self.n_phi, self.n_phi))
      Rphi = np.zeros((self.n_phi, D))
      for n in np.unique(counts):
        mask = counts == n
        L = I_r + n * (PtSi @ Phi)
        Li = np.linalg.inv(L)
        Eyk = (Li @ (PtSi @ class_sums[mask].T)).T     # (k_n, r)
        Ey[mask] = Eyk
        # sum_k n_k E[y y'] = n (k_n Li + sum Eyk Eyk')
        sum_Eyy += n * (mask.sum() * Li + Eyk.T @ Eyk)
        Rphi += n * Eyk.T @ (class_sums[mask] / n)
      # M-step
      Phi = np.linalg.solve(sum_Eyy, Rphi).T            # (D, r)
      resid = Xc - Ey[y_idx] @ Phi.T
      Sigma = (resid.T @ Xc) / len(X)
      Sigma = 0.5 * (Sigma + Sigma.T) + 1e-6 * np.eye(D)
    self.Phi = Phi
    self.Sigma = Sigma
    # per-class latent means for closed-set classification
    self._trained_classes = classes
    Si = np.linalg.inv(Sigma)
    PtSi = Phi.T @ Si
    self._class_latents = np.zeros((K, self.n_phi))
    for k in range(K):
      L = I_r + counts[k] * (PtSi @ Phi)
      self._class_latents[k] = np.linalg.solve(L, PtSi @ class_sums[k])
    return self

  # -- verification scoring -----------------------------------------------------
  def _prep(self, X):
    X = self.normalizer.transform(np.asarray(X, np.float64))
    return X - self.mean

  def score_trials(self, enroll: np.ndarray, test: np.ndarray) -> np.ndarray:
    """Log-likelihood ratio same-vs-different speaker for each (enroll_i,
    test_i) pair — the standard two-covariance PLDA llr."""
    E = self._prep(enroll)
    T = self._prep(test)
    B = self.Phi @ self.Phi.T          # between covariance
    W = self.Sigma                     # within covariance
    tot = B + W
    # joint covariances for same/diff hypotheses
    D = E.shape[1]
    same_top = np.block([[tot, B], [B, tot]])
    diff_top = np.block([[tot, np.zeros_like(B)], [np.zeros_like(B), tot]])
    s_same, ld_same = np.linalg.slogdet(same_top)
    s_diff, ld_diff = np.linalg.slogdet(diff_top)
    P_same = np.linalg.inv(same_top)
    P_diff = np.linalg.inv(diff_top)
    XY = np.concatenate([E, T], axis=1)  # (n, 2D)
    q_same = np.einsum("ni,ij,nj->n", XY, P_same, XY)
    q_diff = np.einsum("ni,ij,nj->n", XY, P_diff, XY)
    return -0.5 * (q_same - q_diff) - 0.5 * (ld_same - ld_diff)

  def score_matrix(self, enroll: np.ndarray, test: np.ndarray) -> np.ndarray:
    """(n_enroll, n_test) llr matrix."""
    E = self._prep(enroll)
    T = self._prep(test)
    B = self.Phi @ self.Phi.T
    W = self.Sigma
    tot = B + W
    tot_i = np.linalg.inv(tot)
    # Schur-complement form of the pairwise llr (standard PLDA identity)
    Lambda = np.linalg.inv(tot - B @ tot_i @ B)
    Q = tot_i - Lambda
    P = tot_i @ B @ Lambda
    _, ld_tot = np.linalg.slogdet(tot)
    _, ld_schur = np.linalg.slogdet(tot - B @ tot_i @ B)
    const = 0.5 * (2 * ld_tot - ld_tot - ld_schur)
    # llr = e'P t + 0.5 e'Q e + 0.5 t'Q t + const with Q = tot^-1 - Lambda
    # (block-inverse of the same-speaker joint covariance; equal to
    # `score_trials` evaluated pairwise — pinned by tests/test_ml.py)
    sE = 0.5 * np.einsum("ni,ij,nj->n", E, Q, E)
    sT = 0.5 * np.einsum("ni,ij,nj->n", T, Q, T)
    cross = E @ P @ T.T
    return cross + sE[:, None] + sT[None, :] + const

  def predict_log_proba(self, X: np.ndarray) -> np.ndarray:
    """Closed-set class log-probabilities against the training classes
    (reference :384)."""
    X = self._prep(X)
    means = self._class_latents @ self.Phi.T     # (K, D)
    Si = np.linalg.inv(self.Sigma)
    _, ld = np.linalg.slogdet(self.Sigma)
    diff = X[:, None, :] - means[None, :, :]
    ll = -0.5 * (np.einsum("nkd,de,nke->nk", diff, Si, diff) + ld)
    ll -= ll.max(axis=1, keepdims=True)
    return ll - np.log(np.exp(ll).sum(axis=1, keepdims=True))

  def predict(self, X) -> np.ndarray:
    return self._trained_classes[np.argmax(self.predict_log_proba(X), axis=1)]
