"""Ivector — GMM -> stats -> T-matrix -> i-vectors orchestration.

Reference: ``odin/ml/ivector.py:83-512`` — fits the UBM, extracts (Z, F)
stats per utterance, trains the T-matrix, extracts i-vectors, with on-disk
caching of every stage (z_path/f_path/ivec_path, :186-200).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence, Tuple

import numpy as np

from odin_tpu.ml.gmm_tmat import GMM, Tmatrix

__all__ = ["Ivector"]


class Ivector:

  def __init__(self,
               path: Optional[str] = None,
               nmix: int = 64,
               tv_dim: int = 100,
               niter_gmm: Optional[Sequence[int]] = None,
               niter_tmat: int = 10,
               batch_size: int = 8192,
               seed: int = 1):
    self.path = path
    if path is not None:
      os.makedirs(path, exist_ok=True)
    self.gmm = GMM(nmix=nmix, niter=niter_gmm, batch_size=batch_size,
                   seed=seed)
    self.tmat = Tmatrix(tv_dim=tv_dim, gmm=self.gmm, niter=niter_tmat,
                        seed=seed)

  def _cache(self, name):
    return os.path.join(self.path, name) if self.path else None

  def fit(self, utterances: Sequence[np.ndarray],
          verbose: bool = False) -> "Ivector":
    """Full pipeline over a list of per-utterance feature matrices."""
    # 1. UBM
    gmm_path = self._cache("gmm.pkl")
    if gmm_path and os.path.exists(gmm_path):
      self.gmm = GMM.load(gmm_path)
      self.tmat.gmm = self.gmm
    else:
      X = np.concatenate([np.asarray(u) for u in utterances], 0)
      self.gmm.fit(X, verbose=verbose)
      if gmm_path:
        self.gmm.save(gmm_path)
    # 2. per-utterance stats
    zf_path = self._cache("stats.npz")
    if zf_path and os.path.exists(zf_path):
      d = np.load(zf_path)
      Z, F = d["Z"], d["F"]
    else:
      Z, F = self.gmm.transform_batch(utterances)
      if zf_path:
        np.savez(zf_path, Z=Z, F=F)
    # 3. T-matrix
    tm_path = self._cache("tmatrix.pkl")
    if tm_path and os.path.exists(tm_path):
      with open(tm_path, "rb") as f:
        self.tmat.Tm = pickle.load(f)["Tm"]
    else:
      self.tmat.fit((Z, F), verbose=verbose)
      if tm_path:
        self.tmat.save(tm_path)
    return self

  def transform(self, utterances: Sequence[np.ndarray]) -> np.ndarray:
    """Utterance features -> i-vectors (n, tv_dim)."""
    Z, F = self.gmm.transform_batch(utterances)
    return self.tmat.transform((Z, F))

  def fit_transform(self, utterances, verbose: bool = False) -> np.ndarray:
    self.fit(utterances, verbose=verbose)
    ivec_path = self._cache("ivecs.npy")
    if ivec_path and os.path.exists(ivec_path):
      return np.load(ivec_path)
    ivecs = self.transform(utterances)
    if ivec_path:
      np.save(ivec_path, ivecs)
    return ivecs
