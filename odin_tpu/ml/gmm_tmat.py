"""GMM-UBM and Total-variability matrix (i-vector) with XLA EM.

Reference: ``odin/ml/gmm_tmat.py`` (2,092 LoC) — sklearn-style diagonal GMM
trained by binary mixup 1->2->...->nmix with a per-level iteration schedule
(`fit` :625-700, `gmm_mixup` :1308); E-step computes Z/F/S sufficient
statistics batched over memory-mapped features with CPU/GPU dispatch
(:997-1232); M-step closed form + variance floor (:1233); `transform` ->
centered stats per utterance (:708); `Tmatrix` EM accumulating LU/RU
(:1727,1818), i-vector posterior mean `transform` (:1898).

TPU redesign: the E-step is ONE jitted chunk-scan of batched matmuls —
posteriors via ``x^2 @ (1/2sigma^2) - x @ (mu/sigma^2) + const`` — and the
sufficient statistics are psum-reduced over the data-parallel mesh axis when
sharded (`expectation` accepts a mesh).  The reference's float64 T-matrix
accumulations are kept in float64 ON HOST between chunks while the per-chunk
compute runs fp32 on device — same stability, accelerator speed.
"""
from __future__ import annotations

import math
import pickle
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu import parallel

__all__ = ["GMM", "Tmatrix"]

EPS = 1e-6


# max in-flight E-step chunks on the host-chunked path: deep enough that
# transfers overlap compute, shallow enough that pending device buffers
# cannot grow to the corpus size (ADVICE r1)
_PIPELINE_DEPTH = 8


def _chunk(n, size):
  for i in range(0, n, size):
    yield i, min(i + size, n)


class GMM:
  """Diagonal-covariance GMM trained by EM with binary mixup.

  API parity with the reference: ``GMM(nmix).fit(X)``, `expectation`,
  `maximization`, `transform(X) -> (Z, F)` centered stats,
  `transform_to_disk`, `score`.
  """

  STANDARD_BATCH_SIZE = 8192

  def __init__(self,
               nmix: int = 16,
               niter: Union[int, Sequence[int]] = None,
               batch_size: int = None,
               covariance_floor: float = 1e-3,
               seed: int = 1,
               dtype: str = "float32"):
    nmix = int(nmix)
    if nmix & (nmix - 1):
      raise ValueError(f"nmix must be a power of two, given {nmix}")
    self.nmix = nmix
    # per-mixup-level iteration schedule (reference `fit` :641-652)
    n_levels = int(math.log2(nmix)) + 1
    default = [1, 2, 4, 4, 4, 4, 6, 6, 10, 10, 15]
    if niter is None:
      niter = default
    elif isinstance(niter, int):
      niter = [niter] * n_levels
    self.niter = list(niter) + [default[-1]] * max(0, n_levels - len(niter))
    self.batch_size = batch_size or self.STANDARD_BATCH_SIZE
    self.covariance_floor = float(covariance_floor)
    self.seed = int(seed)
    self.dtype = dtype
    self.mu: Optional[np.ndarray] = None      # (M, D)
    self.sigma: Optional[np.ndarray] = None   # (M, D) variances
    self.w: Optional[np.ndarray] = None       # (M,)
    self.ndim: Optional[int] = None
    self._estep_fn = None
    self._estep_masked = None
    self._estep_sharded = None
    self._estep_sharded_mesh = None

  @property
  def is_fitted(self) -> bool:
    return self.mu is not None and len(self.w) == self.nmix

  # -- core E-step ------------------------------------------------------------
  def _build_estep(self):
    @jax.jit
    def estep(x, mu, sigma, logw):
      # log N(x; mu_m, sigma_m) summed over dims, all (B, M) via matmuls
      inv = 1.0 / sigma                          # (M, D)
      c = jnp.sum(mu * mu * inv + jnp.log(sigma), axis=1) \
          + mu.shape[1] * jnp.log(2.0 * jnp.pi)  # (M,)
      quad = x * x @ inv.T - 2.0 * (x @ (mu * inv).T)  # (B, M)
      loglik = -0.5 * (quad + c) + logw
      norm = jax.scipy.special.logsumexp(loglik, axis=1, keepdims=True)
      post = jnp.exp(loglik - norm)              # responsibilities (B, M)
      Z = jnp.sum(post, axis=0)                  # (M,)
      F = post.T @ x                             # (M, D)
      S = post.T @ (x * x)                       # (M, D)
      llk = jnp.sum(norm)
      return Z, F, S, llk
    return estep

  def expectation(self, X: np.ndarray,
                  device: str = "auto") -> Tuple[np.ndarray, ...]:
    """Accumulate (Z, F, S, llk) over X in device chunks.

    `device` kept for reference API parity ('cpu'|'gpu'|'mix'|'auto') — on
    TPU there is one device path; chunking bounds HBM use.
    """
    if self._estep_fn is None:
      self._estep_fn = self._build_estep()
    D = X.shape[1]
    M = len(self.w)
    mu = jnp.asarray(self.mu, jnp.float32)
    sigma = jnp.asarray(self.sigma, jnp.float32)
    logw = jnp.log(jnp.asarray(self.w, jnp.float32))[None, :]
    Z = np.zeros(M, np.float64)
    F = np.zeros((M, D), np.float64)
    S = np.zeros((M, D), np.float64)
    llk = 0.0
    # Dispatch chunks ahead of the host sync so transfers pipeline with
    # compute (measured: 10 chunks synced eagerly ran at 69k frames/s;
    # deferred, 156k), but bound the in-flight depth: on the host-chunked
    # path (large corpora that fit() does NOT park in HBM) every pending
    # chunk holds a device buffer, and an unbounded queue can accumulate the
    # whole corpus in HBM.  Host accumulation stays float64 (T-matrix
    # precision).
    on_device = isinstance(X, jax.Array)
    pending = []

    def _drain_oldest():
      nonlocal Z, F, S, llk
      z, f, s, l = pending.pop(0)
      Z += np.asarray(z, np.float64)
      F += np.asarray(f, np.float64)
      S += np.asarray(s, np.float64)
      llk += float(l)

    for i, j in _chunk(len(X), self.batch_size):
      # device-resident corpora slice in HBM — no host round trip per chunk
      x = X[i:j].astype(jnp.float32) if on_device else \
          jnp.asarray(np.asarray(X[i:j]), jnp.float32)
      pending.append(self._estep_fn(x, mu, sigma, logw))
      if not on_device and len(pending) >= _PIPELINE_DEPTH:
        _drain_oldest()
    while pending:
      _drain_oldest()
    return Z, F, S, llk

  def _build_estep_sharded(self, mesh):
    """jit(shard_map) E-step over `mesh`'s 'data' axis; GMM params are
    ARGUMENTS (replicated specs), not closure captures — the same compiled
    callable serves every EM iteration and never embeds a stale mu/sigma
    as a program constant (a remote-compile payload hazard, CLAUDE.md)."""
    from jax.sharding import PartitionSpec as P
    try:
      from jax import shard_map
    except ImportError:  # older jax
      from jax.experimental.shard_map import shard_map
    estep = self._estep_fn or self._build_estep()

    def local_stats(x, mu, sigma, logw):
      z, f, s, llk = estep(x, mu, sigma, logw)
      return (jax.lax.psum(z, "data"), jax.lax.psum(f, "data"),
              jax.lax.psum(s, "data"), jax.lax.psum(llk, "data"))

    return jax.jit(shard_map(
        local_stats, mesh=mesh,
        in_specs=(P("data", None), P(), P(), P()),
        out_specs=(P(), P(), P(), P())))

  def expectation_sharded(self, X, mesh=None) -> Tuple[np.ndarray, ...]:
    """Mesh-parallel E-step: frames sharded over the 'data' axis, sufficient
    statistics psum-reduced across chips — the TPU-native replacement for
    the reference's CPU-process/GPU `_split_jobs` dispatch
    (``gmm_tmat.py:102-133``; see SURVEY.md §2.1 TPU mapping).  `X` may be
    a host array or an already-sharded `jax.Array` (the `fit(mesh=...)`
    path parks the corpus sharded once and reuses it every iteration)."""
    from jax.sharding import PartitionSpec as P
    mesh = mesh or parallel.default_mesh()
    n_dev = mesh.devices.size
    mu = jnp.asarray(self.mu, jnp.float32)
    sigma = jnp.asarray(self.sigma, jnp.float32)
    logw = jnp.log(jnp.asarray(self.w, jnp.float32))[None, :]
    if self._estep_sharded is None or self._estep_sharded_mesh is not mesh:
      self._estep_sharded = self._build_estep_sharded(mesh)
      self._estep_sharded_mesh = mesh
    sharded = self._estep_sharded
    if isinstance(X, jax.Array):
      Z, F, S, llk = (np.asarray(a, np.float64)
                      for a in sharded(X, mu, sigma, logw))
      return Z, F, S, float(llk)
    X = np.asarray(X, np.float32)
    if jax.process_count() > 1:
      # multi-HOST corpus: X is this process's LOCAL frame slice; the
      # global Z/F/S/llk are psum-reduced across every process's devices
      # (tests/test_multihost.py).  No cross-process remainder protocol:
      # local rows must divide the local device count.
      from jax.sharding import NamedSharding
      n_loc = mesh.local_mesh.devices.size
      if len(X) % n_loc:
        raise ValueError(
            f"multi-process E-step: local rows {len(X)} must be divisible "
            f"by the {n_loc} local devices")
      Xg = jax.make_array_from_process_local_data(
          NamedSharding(mesh, P("data", None)), X)
      Z, F, S, llk = (np.asarray(a, np.float64)
                      for a in sharded(Xg, mu, sigma, logw))
      return Z, F, S, float(llk)
    pad = (-len(X)) % n_dev
    if pad:
      # padding frames are given zero weight by appending -inf-energy rows?
      # simplest exact approach: process the remainder separately
      X_main, X_rest = X[:len(X) - (len(X) % n_dev)], X[len(X) - (len(X) % n_dev):]
    else:
      X_main, X_rest = X, X[:0]
    Z, F, S, llk = (np.asarray(a, np.float64)
                    for a in sharded(jnp.asarray(X_main), mu, sigma, logw))
    llk = float(llk)
    if len(X_rest):
      z2, f2, s2, l2 = self.expectation(X_rest)
      Z, F, S, llk = Z + z2, F + f2, S + s2, llk + l2
    return Z, F, S, llk

  def maximization(self, Z, F, S, floor_const: Optional[float] = None):
    """Closed-form M-step + variance flooring (reference :1233-1276)."""
    iZ = 1.0 / np.maximum(Z[:, None], EPS)
    self.w = (Z / Z.sum()).astype(self.dtype)
    self.mu = (F * iZ).astype(self.dtype)
    sigma = S * iZ - self.mu.astype(np.float64) ** 2
    floor = (floor_const if floor_const is not None
             else self.covariance_floor) * sigma.mean(axis=0, keepdims=True)
    self.sigma = np.maximum(sigma, floor).astype(self.dtype)
    return self

  def gmm_mixup(self, perturb: float = 1.0):
    """Split every component along its largest-variance dim
    (reference :1308-1342)."""
    M, D = self.mu.shape
    idx = np.argmax(self.sigma, axis=1)
    eps = np.zeros((M, D), self.mu.dtype)
    eps[np.arange(M), idx] = np.sqrt(self.sigma[np.arange(M), idx]) * perturb
    self.mu = np.concatenate([self.mu - eps, self.mu + eps], axis=0)
    self.sigma = np.concatenate([self.sigma, self.sigma], axis=0)
    self.w = np.concatenate([self.w, self.w], axis=0) * 0.5
    return self

  def initialize(self, X):
    X = np.asarray(X[:min(len(X), 100000)])
    self.ndim = X.shape[1]
    self.mu = X.mean(0, keepdims=True).astype(self.dtype)
    self.sigma = np.maximum(X.var(0, keepdims=True), EPS).astype(self.dtype)
    self.w = np.ones(1, self.dtype)
    return self

  def fit(self, X, verbose: bool = False, tol: float = 1e-5,
          max_final_iter: int = 50, mesh=None) -> "GMM":
    """Binary-mixup EM schedule 1 -> 2 -> ... -> nmix (reference :625-700);
    the final level additionally iterates to convergence (llk improvement
    below `tol` per frame), bounded by `max_final_iter`.

    With ``mesh``, the corpus is parked SHARDED over the mesh's 'data'
    axis once and every E-step runs as one psum-reduced shard_map — the
    multi-chip EM for corpora beyond a single chip's HBM (per-chip
    footprint = corpus bytes / n_devices)."""
    if isinstance(X, (tuple, list)):
      X = np.concatenate([np.asarray(x) for x in X], 0)
    self.initialize(X)
    X_rest = np.asarray(X[:0], np.float32)
    n_frames = len(X)
    if mesh is not None:
      from jax.sharding import NamedSharding, PartitionSpec as P
      Xnp = np.asarray(X, np.float32)
      cut = len(Xnp) - (len(Xnp) % mesh.devices.size)
      X_rest = Xnp[cut:]
      X = jax.device_put(Xnp[:cut],
                         NamedSharding(mesh, P("data", None)))
    else:
      # EM re-reads the SAME corpus every iteration: park it in HBM once
      # when it fits (<= ~2 GB) so every E-step is pure compute — on the
      # remote-attached chip the per-iteration transfer otherwise dominates
      # (156k vs 69k frames/s was just async dispatch; device-resident
      # removes the transfer entirely).
      try:
        if np.asarray(X).nbytes <= 2 << 30:
          X = jax.device_put(np.asarray(X, np.float32))
      except Exception:
        pass  # fall back to host-chunked transfers

    def _estep_full():
      if mesh is None:
        return self.expectation(X)
      Z, F, S, llk = self.expectation_sharded(X, mesh)
      if len(X_rest):
        z2, f2, s2, l2 = self.expectation(X_rest)
        Z, F, S, llk = Z + z2, F + f2, S + s2, llk + l2
      return Z, F, S, llk

    level = 0
    while True:
      final = len(self.w) >= self.nmix
      n_iter = max_final_iter if final else self.niter[level]
      prev_llk = -np.inf
      for it in range(n_iter):
        Z, F, S, llk = _estep_full()
        self.maximization(Z, F, S)
        if verbose:
          print(f"[GMM] nmix={len(self.w):4d} iter={it} "
                f"llk/frame={llk / n_frames:.4f}")
        if final and it >= self.niter[level] and \
            (llk - prev_llk) / n_frames < tol:
          break
        prev_llk = llk
      if final:
        break
      self.gmm_mixup()
      level += 1
    return self

  # -- inference ----------------------------------------------------------------
  def logprob(self, X) -> np.ndarray:
    """Per-frame log p(x) under the mixture."""
    if self._estep_fn is None:
      self._estep_fn = self._build_estep()
    out = []
    mu = jnp.asarray(self.mu, jnp.float32)
    sigma = jnp.asarray(self.sigma, jnp.float32)
    logw = jnp.log(jnp.asarray(self.w, jnp.float32))[None, :]

    @jax.jit
    def _lp(x):
      inv = 1.0 / sigma
      c = jnp.sum(mu * mu * inv + jnp.log(sigma), axis=1) \
          + mu.shape[1] * jnp.log(2.0 * jnp.pi)
      quad = x * x @ inv.T - 2.0 * (x @ (mu * inv).T)
      return jax.scipy.special.logsumexp(-0.5 * (quad + c) + logw, axis=1)

    for i, j in _chunk(len(X), self.batch_size):
      out.append(np.asarray(_lp(jnp.asarray(np.asarray(X[i:j]), jnp.float32))))
    return np.concatenate(out)

  def score(self, X) -> float:
    return float(np.mean(self.logprob(X)))

  def transform(self, X, zero: bool = True, first: bool = True):
    """Per-utterance centered statistics (Z, F) for i-vector extraction
    (reference :708-768): F is centered by mu and flattened (M*D,)."""
    Z, F, S, _ = self.expectation(np.asarray(X))
    Fc = F - Z[:, None] * self.mu.astype(np.float64)
    out = []
    if zero:
      out.append(Z.astype(self.dtype))
    if first:
      out.append(Fc.reshape(-1).astype(self.dtype))
    return out[0] if len(out) == 1 else tuple(out)

  def _build_estep_masked(self):
    @jax.jit
    def estep(x, mask, mu, sigma, logw):
      """Per-utterance (Z, F) over a padded batch: x (B, T, D),
      mask (B, T) float — invalid frames contribute nothing."""
      inv = 1.0 / sigma
      c = jnp.sum(mu * mu * inv + jnp.log(sigma), axis=1) \
          + mu.shape[1] * jnp.log(2.0 * jnp.pi)
      quad = (x * x) @ inv.T - 2.0 * (x @ (mu * inv).T)   # (B, T, M)
      loglik = -0.5 * (quad + c) + logw
      norm = jax.scipy.special.logsumexp(loglik, axis=-1, keepdims=True)
      post = jnp.exp(loglik - norm) * mask[..., None]     # (B, T, M)
      Z = jnp.sum(post, axis=1)                           # (B, M)
      F = jnp.einsum("btm,btd->bmd", post, x)             # (B, M, D)
      return Z, F
    return estep

  def transform_batch(self, utterances: Sequence[np.ndarray],
                      batch_size: int = 64):
    """(Z, F) stats for many utterances at once — the reference's MPI
    `transform_to_disk` (:769) redesigned as padded, mask-aware batched
    E-steps: utterances are bucketed to power-of-2 lengths (bounding
    recompiles) and each bucket runs as ONE jit over (B, T, D), instead
    of one dispatch (and one compile per distinct length) per utterance.
    """
    if self._estep_masked is None:
      self._estep_masked = self._build_estep_masked()
    mu = jnp.asarray(self.mu, jnp.float32)
    sigma = jnp.asarray(self.sigma, jnp.float32)
    logw = jnp.log(jnp.asarray(self.w, jnp.float32))[None, :]
    n = len(utterances)
    D = np.asarray(utterances[0]).shape[1]
    M = len(self.w)
    # bucket by padded length (next power of two)
    buckets: Dict[int, list] = {}
    for idx, u in enumerate(utterances):
      u = np.asarray(u, np.float32)
      T = max(int(2 ** np.ceil(np.log2(max(len(u), 1)))), 8)
      buckets.setdefault(T, []).append((idx, u))
    Zs = np.zeros((n, M), self.dtype)
    Fs = np.zeros((n, M * D), self.dtype)
    mu64 = self.mu.astype(np.float64)
    for T, items in sorted(buckets.items()):
      for s in range(0, len(items), batch_size):
        part = items[s:s + batch_size]
        x = np.zeros((len(part), T, D), np.float32)
        mask = np.zeros((len(part), T), np.float32)
        for b, (_, u) in enumerate(part):
          x[b, :len(u)] = u
          mask[b, :len(u)] = 1.0
        Z, F = self._estep_masked(jnp.asarray(x), jnp.asarray(mask),
                                  mu, sigma, logw)
        Z = np.asarray(Z, np.float64)
        F = np.asarray(F, np.float64)
        Fc = F - Z[:, :, None] * mu64[None]               # center
        for b, (idx, _) in enumerate(part):
          Zs[idx] = Z[b].astype(self.dtype)
          Fs[idx] = Fc[b].reshape(-1).astype(self.dtype)
    return Zs, Fs

  # -- persistence ----------------------------------------------------------------
  def save(self, path: str):
    with open(path, "wb") as f:
      pickle.dump(dict(nmix=self.nmix, mu=self.mu, sigma=self.sigma,
                       w=self.w, ndim=self.ndim), f)

  @classmethod
  def load(cls, path: str) -> "GMM":
    with open(path, "rb") as f:
      d = pickle.load(f)
    gmm = cls(nmix=d["nmix"])
    gmm.mu, gmm.sigma, gmm.w, gmm.ndim = d["mu"], d["sigma"], d["w"], d["ndim"]
    return gmm

  def __repr__(self):
    m = len(self.w) if self.w is not None else 0
    return f"GMM(nmix={self.nmix}, fitted_mix={m}, ndim={self.ndim})"


class Tmatrix:
  """Total-variability matrix for i-vector extraction.

  Reference: ``odin/ml/gmm_tmat.py:1343-2092`` — EM over per-utterance
  (Z, F) stats; E-step accumulates LU/RU, M-step solves per-mixture linear
  systems; `transform` returns the i-vector posterior mean.
  """

  def __init__(self,
               tv_dim: int = 100,
               gmm: Optional[GMM] = None,
               niter: int = 10,
               batch_size: int = 256,
               seed: int = 1):
    self.tv_dim = int(tv_dim)
    self.gmm = gmm
    self.niter = int(niter)
    self.batch_size = int(batch_size)
    self.seed = int(seed)
    self.Tm: Optional[np.ndarray] = None  # (tv_dim, M*D)
    self._fns = {}
    self._estep_sharded = None
    self._estep_sharded_mesh = None

  @property
  def nmix(self):
    return len(self.gmm.w)

  @property
  def ndim(self):
    return self.gmm.ndim

  def _sigma_flat(self) -> np.ndarray:
    return self.gmm.sigma.reshape(-1).astype(np.float64)  # (M*D,)

  def initialize(self):
    rng = np.random.RandomState(self.seed)
    MD = self.nmix * self.ndim
    sigma = self._sigma_flat()
    self.Tm = (rng.randn(self.tv_dim, MD) * np.sqrt(sigma)[None, :] * 0.001)
    return self

  def _build_estep(self):
    return jax.jit(self._estep_body())

  def _estep_body(self):
    R = self.tv_dim

    def estep(Z, F, T, sigma_inv):
      # T: (R, MD); per utterance i:
      #   L_i = I + sum_m Z[i,m] * T_m Sigma_m^-1 T_m^T
      #   b_i = T Sigma^-1 F_i
      # posterior: Cov = L^-1, mean = Cov b
      M = Z.shape[1]
      D = T.shape[1] // M
      T3 = (T * sigma_inv[None, :]).reshape(R, M, D)      # T Sigma^-1
      Torig = T.reshape(R, M, D)
      # per-mixture R x R blocks: (M, R, R)
      TT = jnp.einsum("rmd,smd->mrs", T3, Torig)
      L = jnp.eye(R)[None] + jnp.einsum("bm,mrs->brs", Z, TT)  # (B, R, R)
      b = jnp.einsum("rk,bk->br", T * sigma_inv[None, :], F)   # (B, R)
      chol = jnp.linalg.cholesky(L)
      mean = jax.scipy.linalg.cho_solve((chol, True), b[..., None])[..., 0]
      cov = jax.scipy.linalg.cho_solve(
          (chol, True), jnp.broadcast_to(jnp.eye(R), L.shape))
      Exx = cov + mean[:, :, None] * mean[:, None, :]          # (B, R, R)
      # accumulators
      LU = jnp.einsum("bm,brs->mrs", Z, Exx)                   # (M, R, R)
      RU = jnp.einsum("br,bk->rk", mean, F)                    # (R, MD)
      llk = -0.5 * jnp.sum(
          jnp.einsum("brs,bsr->b", Exx, L - jnp.eye(R)[None])) + \
          jnp.sum(mean * b)
      return LU, RU, llk, mean
    return estep

  def expectation(self, Z: np.ndarray, F: np.ndarray):
    """Accumulate LU (M,R,R), RU (R,MD) over utterance stats."""
    if "estep" not in self._fns:
      self._fns["estep"] = self._build_estep()
    M, MD = self.nmix, self.nmix * self.ndim
    sigma_inv = jnp.asarray(1.0 / self._sigma_flat(), jnp.float32)
    T = jnp.asarray(self.Tm, jnp.float32)
    LU = np.zeros((M, self.tv_dim, self.tv_dim), np.float64)
    RU = np.zeros((self.tv_dim, MD), np.float64)
    llk = 0.0
    # async-dispatch chunks ahead of the host pull, bounded in-flight depth
    # (see GMM.expectation)
    pending = []

    def _drain_oldest():
      nonlocal LU, RU, llk
      lu, ru, l, _ = pending.pop(0)
      LU += np.asarray(lu, np.float64)
      RU += np.asarray(ru, np.float64)
      llk += float(l)

    for i, j in _chunk(len(Z), self.batch_size):
      pending.append(self._fns["estep"](
          jnp.asarray(Z[i:j], jnp.float32), jnp.asarray(F[i:j], jnp.float32),
          T, sigma_inv))
      if len(pending) >= _PIPELINE_DEPTH:
        _drain_oldest()
    while pending:
      _drain_oldest()
    return LU, RU, llk

  def _build_estep_sharded(self, mesh):
    """jit(shard_map) E-step over `mesh`'s 'data' axis; T and sigma_inv are
    ARGUMENTS (replicated specs), not closure captures — one compile serves
    every EM iteration and the (potentially huge) T-matrix is never embedded
    as a program constant (same design as `GMM._build_estep_sharded`;
    remote-compile payload hazard, CLAUDE.md / ADVICE r3)."""
    from jax.sharding import PartitionSpec as P
    try:
      from jax import shard_map
    except ImportError:  # older jax
      from jax.experimental.shard_map import shard_map
    body = self._estep_body()

    def local_stats(z, f, T, sigma_inv):
      lu, ru, llk, _ = body(z, f, T, sigma_inv)
      return (jax.lax.psum(lu, "data"), jax.lax.psum(ru, "data"),
              jax.lax.psum(llk, "data"))

    return jax.jit(shard_map(
        local_stats, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P(), P()),
        out_specs=(P(), P(), P())))

  def expectation_sharded(self, Z: np.ndarray, F: np.ndarray, mesh=None):
    """Mesh-parallel E-step: utterances sharded over the 'data' axis,
    LU/RU/llk psum-reduced across chips — the TPU-native replacement for
    the reference's multiprocess+GPU LU/RU split (``gmm_tmat.py:1727``).
    In a multi-process run each process passes its LOCAL utterance slice
    (same contract as `GMM.expectation_sharded`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = mesh or parallel.default_mesh()
    n_dev = mesh.devices.size
    sigma_inv = jnp.asarray(1.0 / self._sigma_flat(), jnp.float32)
    T = jnp.asarray(self.Tm, jnp.float32)
    if self._estep_sharded is None or self._estep_sharded_mesh is not mesh:
      self._estep_sharded = self._build_estep_sharded(mesh)
      self._estep_sharded_mesh = mesh
    sharded = self._estep_sharded
    Z = np.asarray(Z, np.float32)
    F = np.asarray(F, np.float32)
    if jax.process_count() > 1:
      n_loc = mesh.local_mesh.devices.size
      if len(Z) % n_loc:
        raise ValueError(
            f"multi-process E-step: local rows {len(Z)} must be divisible "
            f"by the {n_loc} local devices")
      sh = NamedSharding(mesh, P("data", None))
      LU, RU, llk = (np.asarray(a, np.float64) for a in sharded(
          jax.make_array_from_process_local_data(sh, Z),
          jax.make_array_from_process_local_data(sh, F), T, sigma_inv))
      return LU, RU, float(llk)
    cut = len(Z) - (len(Z) % n_dev)
    LU, RU, llk = (np.asarray(a, np.float64)
                   for a in sharded(jnp.asarray(Z[:cut]),
                                    jnp.asarray(F[:cut]), T, sigma_inv))
    llk = float(llk)
    if cut < len(Z):
      lu2, ru2, l2 = self.expectation(Z[cut:], F[cut:])
      LU, RU, llk = LU + lu2, RU + ru2, llk + l2
    return LU, RU, llk

  def maximization(self, LU: np.ndarray, RU: np.ndarray,
                   orthogonalize: bool = True):
    """Solve T_m from LU_m T_m = RU_m per mixture (reference :1818);
    optional orthogonalization of the factor space."""
    M, D, R = self.nmix, self.ndim, self.tv_dim
    Tm = np.empty((R, M * D))
    for m in range(M):
      Tm[:, m * D:(m + 1) * D] = np.linalg.solve(LU[m], RU[:, m * D:(m + 1) * D])
    if orthogonalize:
      U, _, Vt = np.linalg.svd(Tm @ Tm.T)
      # re-orthogonalize the row space (stabilizes EM, reference option)
      Tm = U.T @ Tm
    self.Tm = Tm
    return self

  def fit(self, stats: Tuple[np.ndarray, np.ndarray],
          verbose: bool = False, mesh=None) -> "Tmatrix":
    """EM over the utterance stats; with ``mesh``, every E-step runs
    mesh-parallel (utterances sharded, LU/RU psum-reduced — see
    `expectation_sharded`)."""
    Z, F = stats
    Z = np.asarray(Z)
    F = np.asarray(F)
    if self.Tm is None:
      self.initialize()
    for it in range(self.niter):
      if mesh is not None:
        LU, RU, llk = self.expectation_sharded(Z, F, mesh)
      else:
        LU, RU, llk = self.expectation(Z, F)
      self.maximization(LU, RU)
      if verbose:
        print(f"[Tmatrix] iter={it} aux-llk={llk / len(Z):.4f}")
    return self

  def transform(self, stats: Tuple[np.ndarray, np.ndarray]) -> np.ndarray:
    """Posterior-mean i-vectors (B, tv_dim) (reference :1898)."""
    Z, F = stats
    Z = np.atleast_2d(np.asarray(Z))
    F = np.atleast_2d(np.asarray(F))
    if "estep" not in self._fns:
      self._fns["estep"] = self._build_estep()
    sigma_inv = jnp.asarray(1.0 / self._sigma_flat(), jnp.float32)
    T = jnp.asarray(self.Tm, jnp.float32)
    out = []
    for i, j in _chunk(len(Z), self.batch_size):
      _, _, _, mean = self._fns["estep"](
          jnp.asarray(Z[i:j], jnp.float32), jnp.asarray(F[i:j], jnp.float32),
          T, sigma_inv)
      out.append(np.asarray(mean))
    return np.concatenate(out)

  def save(self, path: str):
    with open(path, "wb") as f:
      pickle.dump(dict(tv_dim=self.tv_dim, Tm=self.Tm), f)

  def __repr__(self):
    return f"Tmatrix(tv_dim={self.tv_dim}, nmix={self.nmix if self.gmm else None})"
